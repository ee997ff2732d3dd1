from geneface_tpu.models.postnet.models import (  # noqa: F401
    CNNPostNet,
    MLPDiscriminator,
    PitchContourCNNPostNet,
)
