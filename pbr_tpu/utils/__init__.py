from pbr_tpu.utils.config import Config, load_config  # noqa: F401
from pbr_tpu.utils.log import Logger  # noqa: F401
