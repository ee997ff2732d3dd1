from geneface_tpu.models.syncnet.models import LandmarkHubertSyncNet, sync_loss  # noqa: F401
