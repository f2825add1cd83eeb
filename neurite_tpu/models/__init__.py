"""
ne.models — model builders (flax).
"""
from neurite_tpu.models.unet import (  # noqa: F401
    UNet, ConvEnc, ConvDec, AddPrior,
    unet, dilation_net, conv_enc, conv_dec, add_prior, get_activation,
)
from neurite_tpu.models.ae import (  # noqa: F401
    AE, SingleAE, ae, single_ae,
)
from neurite_tpu.models.classify import (  # noqa: F401
    DesignDNN, EncoderNetModule, DenseLayerNetModule,
    design_dnn, EncoderNet, DenseLayerNet,
)
from neurite_tpu.models.synth import (  # noqa: F401
    LabelsToImage, LabelsToImageV1, SynthStripModule,
    labels_to_image, labels_to_image_new, SynthStrip,
)
