from geneface_tpu.models.nerf.backbone import NeRFBackbone  # noqa: F401
from geneface_tpu.models.nerf.models import ADNeRF, ADNeRFTorso, Lm3dNeRF  # noqa: F401
