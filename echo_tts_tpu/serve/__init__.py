from .config import ServeConfig, device_info, load_config, scan_voices
from .handler import build_sample_fn, handler, health_check, synthesize
from .models import load_models

__all__ = ["ServeConfig", "build_sample_fn", "device_info", "handler",
           "health_check", "load_config", "load_models", "scan_voices",
           "synthesize"]
