"""
ne.models — model builders (flax).
"""
from neurite_tpu.models.unet import (  # noqa: F401
    UNet, ConvEnc, ConvDec, AddPrior,
    unet, dilation_net, conv_enc, conv_dec, add_prior, get_activation,
)
