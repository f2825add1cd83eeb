"""
Public-API parity pin: every public name of the reference package must exist
in the corresponding neurite_tpu module (SURVEY.md §2 inventory, judged
line-by-line). The reference names are pinned here statically so the test
runs without the reference tree.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne


REFERENCE_API = {
    'utils': [
        'setup_device', 'interpn', 'resize', 'zoom', 'map_fn_axis',
        'volshape_to_ndgrid', 'volshape_to_meshgrid', 'ndgrid', 'meshgrid',
        'flatten', 'take', 'barycenter', 'gaussian_kernel', 'separable_conv',
        'subsample_axis', 'softmax', 'logtanh', 'arcsinh', 'logistic',
        'sigmoid', 'logistic_fixed_ends', 'sigmoid_fixed_ends', 'soft_round',
        'soft_delta', 'odd_shifted_relu', 'minmax_norm', 'whiten',
        'perlin_vol', 'sub2ind2d', 'prod_n', 'soft_quantize', 'soft_digitize',
        'batch_channel_flatten', 'flatten_axes', 'fftn', 'ifftn', 'fftshift',
        'ifftshift', 'complex_to_channels', 'channels_to_complex',
        'batch_gather',
    ],
    'utils.augment': [
        'draw_perlin', 'random_blur_rescale', 'draw_perlin_full',
        'draw_crop_mask',
    ],
    'layers': [
        'Negate', 'RescaleValues', 'Resize', 'Zoom', 'SoftQuantize', 'MSE',
        'GaussianBlur', 'Subsample', 'RandomCrop', 'RandomClip',
        'SpatiallySparse_Dense', 'LocalBias', 'LocalLinear',
        'LocallyConnected3D', 'LocalCrossLinear', 'LocalCrossLinearTrf',
        'LocalParamLayer', 'LocalParamWithInput', 'MeanStream', 'CovStream',
        'FFT', 'IFFT', 'FFTShift', 'IFFTShift', 'ComplexToChannels',
        'ChannelsToComplex', 'SampleNormalLogVar', 'GaussianNoise',
        'PerlinNoise', 'HyperConv', 'HyperConv2D', 'HyperConv3D',
        'HyperConvFromDense', 'HyperDense', 'HyperDenseFromDense',
    ],
    'models': [
        'dilation_net', 'unet', 'ae', 'add_prior', 'single_ae',
        'labels_to_image', 'labels_to_image_new', 'conv_enc', 'conv_dec',
        'design_dnn', 'EncoderNet', 'DenseLayerNet', 'SynthStrip',
    ],
    'metrics': [
        'MutualInformation', 'Dice', 'SoftDice', 'HardDice',
        'CategoricalCrossentropy', 'MeanSquaredErrorProb',
        'multiple_metrics_decorator',
    ],
    'losses': [
        'Dice', 'SoftDice', 'HardDice', 'CategoricalCrossentropy',
        'MeanSquaredErrorProb', 'multiple_losses_decorator',
    ],
    'regularizers': ['soft_l0_wrap'],
    'generators': [
        'Vol', 'vol', 'patch', 'vol_seg', 'vol_cat', 'add_prior',
        'vol_prior', 'vol_seg_prior', 'vol_sr_slices', 'img_seg',
    ],
    'dataproc': [
        'proc_mgh_vols', 'scans_to_slices', 'vol_proc', 'prior_to_weights',
        'filestruct_change', 'ml_split',
    ],
    'callbacks': [
        'ModelWeightCheck', 'CheckLossTrend', 'PlotTestSlices',
        'PredictMetrics', 'ModelCheckpoint', 'ModelCheckpointParallel',
        'TimeHistory', 'LRLog',
    ],
    'modelio': ['store_config_args', 'LoadableModel'],
    'py.utils': [
        'get_backend', 'softmax', 'rebase_lab', 'load_fs_lut',
        'seg_to_rgb_fs_lut', 'fs_lut_to_cmap', 'normalize_axes',
    ],
    'plot': ['slices', 'volume3D', 'flow', 'flow_legend', 'pca'],
}
REFERENCE_API['utils.seg'] = [
    'predict_volumes', 'predict_volume_stack', 'next_pred_label',
    'next_label', 'sample_to_label', 'next_vol_pred', 'recode',
    'pred_to_label', 'prob_of_label',
]
REFERENCE_API['utils.vae'] = [
    'extract_z_dec', 'z_effect', 'sample_dec', 'sweep_dec_given_x',
    'pca_init_dense', 'model_output_pca', 'latent_stats',
    'latent_stats_plots',
]
REFERENCE_API['utils.model'] = [
    'stack_models', 'mod_submodel', 'reset_weights', 'copy_weights',
    'robust_multi_gpu', 'diagram',
]


@pytest.mark.parametrize('module', sorted(REFERENCE_API))
def test_reference_names_present(module):
    obj = ne
    for part in module.split('.'):
        obj = getattr(obj, part)
    missing = [n for n in REFERENCE_API[module] if not hasattr(obj, n)]
    assert not missing, f'{module} missing: {missing}'


def test_neurite_alias_package():
    """`import neurite as ne` works against the rebuild, with a rename
    warning carrying the import site (ref `neuron/__init__.py:1-14`)."""
    import importlib
    import sys
    import warnings
    sys.modules.pop('neurite', None)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        alias = importlib.import_module('neurite')
    assert any('neurite_tpu' in str(w.message) for w in caught)
    assert alias.models.unet is ne.models.unet
    assert alias.__version__ == ne.__version__
    from neurite.utils import interpn as alias_interpn
    assert alias_interpn is ne.utils.interpn


def test_setup_device():
    devs = ne.utils.setup_device()
    assert len(devs) >= 1
    one = ne.utils.setup_device(0)
    assert len(one) == 1


def test_loadable_model_roundtrip():
    class MyModel(ne.modelio.LoadableModel):
        @ne.modelio.store_config_args
        def __init__(self, nb_features=4):
            super().__init__(ne.models.unet(
                nb_features=nb_features, input_shape=(8, 8, 1), nb_levels=2,
                conv_size=3, nb_labels=2))

    m = MyModel(nb_features=4)
    x = jnp.zeros((1, 8, 8, 1))
    m.init(jax.random.PRNGKey(0), x)
    out1 = m.apply(x)
    assert m.get_config()['nb_features'] == 4
    with tempfile.TemporaryDirectory() as d:
        m.save(d)
        m2 = MyModel.load(d)
        out2 = m2.apply(x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_model_output_pca():
    from neurite_tpu.utils import vae as vae_utils
    rng = np.random.default_rng(0)
    data = iter([rng.normal(size=(8, 6)).astype(np.float32)
                 for _ in range(3)])
    comps, var, mean, proj = vae_utils.model_output_pca(
        lambda x: x * 2., data, nb_batches=3, nb_components=2)
    assert comps.shape == (2, 6)
    assert proj.shape == (24, 2)
    # principal axes are orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-6)
