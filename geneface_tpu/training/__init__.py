from geneface_tpu.training.optim import (  # noqa: F401
    label_params,
    multi_group_adam,
    radnerf_label_fn,
    radnerf_torso_label_fn,
)
from geneface_tpu.training.schedules import build_schedule  # noqa: F401
from geneface_tpu.training.trainer import Task, Trainer, resolve_task  # noqa: F401
