from geneface_tpu.models.radnerf.cond_encoder import MLP, AudioAttNet, AudioNet  # noqa: F401
from geneface_tpu.models.radnerf.radnerf import COND_IN_DIMS, RADNeRF  # noqa: F401
from geneface_tpu.models.radnerf.radnerf_torso import (  # noqa: F401
    RADNeRFTorso,
    sample_torso_occupancy,
)
from geneface_tpu.models.radnerf.renderer import (  # noqa: F401
    OccupancyState,
    TorsoOccupancyState,
    init_occupancy,
    init_torso_occupancy,
    make_aabb,
    mark_untrained_grid,
    render_rays_radnerf,
    render_rays_radnerf_torso,
    update_extra_state,
    update_torso_occupancy,
)
