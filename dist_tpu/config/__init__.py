from dist_tpu.config.config import Config, load_config

__all__ = ["Config", "load_config"]
