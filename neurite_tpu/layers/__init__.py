"""
ne.layers — flax layer modules with capability parity to reference
`neurite/tf/layers.py`.
"""
from neurite_tpu.layers.basic import (  # noqa: F401
    Negate, RescaleValues, Resize, Zoom, SoftQuantize, MSE,
    FFT, IFFT, FFTShift, IFFTShift, ComplexToChannels, ChannelsToComplex,
)
from neurite_tpu.layers.random import (  # noqa: F401
    GaussianBlur, Subsample, RandomCrop, RandomClip,
    SampleNormalLogVar, GaussianNoise, PerlinNoise,
)
from neurite_tpu.layers.local import (  # noqa: F401
    LocalBias, LocalLinear, LocalParamLayer, LocalParamWithInput, LocalParam,
    LocalCrossLinear, LocalCrossLinearTrf,
    LocallyConnected, LocallyConnected1D, LocallyConnected2D,
    LocallyConnected3D,
)
from neurite_tpu.layers.sparse import SpatiallySparse_Dense  # noqa: F401
from neurite_tpu.layers.stream import MeanStream, CovStream  # noqa: F401
from neurite_tpu.layers.hyper import (  # noqa: F401
    HyperConv, HyperConv2D, HyperConv3D,
    HyperConvFromDense, HyperConv2DFromDense, HyperConv3DFromDense,
    HyperDense, HyperDenseFromDense,
)
