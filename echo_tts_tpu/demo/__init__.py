from .app import DemoSession, CFG_PRESETS, TRUNCATION_PRESETS

__all__ = ["DemoSession", "CFG_PRESETS", "TRUNCATION_PRESETS"]
