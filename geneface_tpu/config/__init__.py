from geneface_tpu.config.config import (  # noqa: F401
    Config,
    load_config,
    parse_overrides,
    save_config,
)
