from geneface_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
    get_all_checkpoints,
    get_last_checkpoint,
    load_checkpoint,
    restore_partial,
    save_checkpoint,
)
from geneface_tpu.utils.indexed_dataset import (  # noqa: F401
    IndexedDataset,
    IndexedDatasetBuilder,
)
from geneface_tpu.utils.logging import MetricsLogger  # noqa: F401
from geneface_tpu.utils.meters import AvgMeter, MeterBank, Timer  # noqa: F401
from geneface_tpu.utils.multiprocess import (  # noqa: F401
    MultiprocessManager,
    multiprocess_run,
)
