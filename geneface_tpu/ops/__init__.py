from geneface_tpu.ops.activations import trunc_exp  # noqa: F401
from geneface_tpu.ops.encoders import (  # noqa: F401
    GridMeta,
    freq_encode,
    grid_encode,
    grid_total_variation,
    init_grid_embeddings,
    make_grid_meta,
    sh_encode,
)
from geneface_tpu.ops.encoders import get_encoder  # noqa: F401
from geneface_tpu.ops.geometry import (  # noqa: F401
    extract_fields,
    extract_geometry,
    linear_to_srgb,
    marching_tetrahedra,
    sph_from_ray,
    srgb_to_linear,
)
from geneface_tpu.ops.morton import (  # noqa: F401
    dilate_grid3d,
    morton3d,
    morton3d_invert,
    packbits,
)
from geneface_tpu.ops.raymarch import (  # noqa: F401
    MarchResult,
    composite_rays,
    lattice_span_cells,
    march_rays_lattice,
    march_rays_train,
    near_far_from_aabb,
    pack_occ_blocks,
)
from geneface_tpu.ops.volume import raw2outputs, render_rays, sample_pdf  # noqa: F401
