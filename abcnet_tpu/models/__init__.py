"""Models: multi-head U-Net detector and variants."""

from .unet import (UNet, create_unet, init_unet, param_count,
                   PRODUCTION_HEADS, LEGACY_HEADS, HEAD_NAMES)

__all__ = ["UNet", "create_unet", "init_unet", "param_count",
           "PRODUCTION_HEADS", "LEGACY_HEADS", "HEAD_NAMES"]
