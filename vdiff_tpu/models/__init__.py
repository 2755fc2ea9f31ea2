from .unet import UNet, ResidualBlock, AttentionBlock

__all__ = ["UNet", "ResidualBlock", "AttentionBlock"]
