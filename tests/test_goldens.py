"""
Golden parity tests (VERDICT r2 item 9): the framework vs COMMITTED float64
numpy oracles of the reference formulas (tests/goldens/goldens.npz, generated
once by tests/goldens/make_goldens.py). Unlike the formula-parity tests,
these survive refactors of the jax implementations — any semantic drift
from the reference math fails here at 1e-5.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne
from neurite_tpu.utils import core

G = np.load(os.path.join(os.path.dirname(__file__), 'goldens',
                         'goldens.npz'))


def close(got, key, atol=1e-5):
    np.testing.assert_allclose(np.asarray(got, np.float64), G[key],
                               atol=atol, rtol=1e-5)


class TestInterpnGoldens:
    @pytest.mark.parametrize('method,fill,key', [
        ('linear', None, 'interpn_linear'),
        ('linear', -7.25, 'interpn_linear_fill'),
        ('nearest', None, 'interpn_nearest'),
        ('nearest', -7.25, 'interpn_nearest_fill'),
    ])
    def test_interpn_3d(self, method, fill, key):
        got = core.interpn(jnp.asarray(G['interpn_vol'], jnp.float32),
                           jnp.asarray(G['interpn_loc'], jnp.float32),
                           interp_method=method, fill_value=fill)
        close(got, key)

    @pytest.mark.parametrize('impl', ['gather', 'window'])
    def test_engines_match_goldens(self, impl):
        got = core.interpn(jnp.asarray(G['interpn_vol'], jnp.float32),
                           jnp.asarray(G['interpn_loc'], jnp.float32),
                           impl=impl, max_disp=3.0, block=(4, 4, 4))
        close(got, 'interpn_linear')

    def test_interpn_2d_no_channel(self):
        got = core.interpn(jnp.asarray(G['interpn2_vol'], jnp.float32),
                           jnp.asarray(G['interpn2_loc'], jnp.float32))
        close(got, 'interpn2_linear')


class TestResizeGoldens:
    def test_up(self):
        close(core.resize(jnp.asarray(G['resize_vol'], jnp.float32),
                          [1.7, 1.3, 2.0]), 'resize_up')

    def test_down(self):
        close(core.resize(jnp.asarray(G['resize_vol'], jnp.float32),
                          [0.5, 0.75, 0.6]), 'resize_down')

    def test_nearest(self):
        close(core.resize(jnp.asarray(G['resize_vol'], jnp.float32),
                          [1.5, 1.5, 1.5], interp_method='nearest'),
              'resize_nearest')


class TestSoftQuantizeGoldens:
    def test_minmax_centers(self):
        close(core.soft_quantize(jnp.asarray(G['sq_x'], jnp.float32),
                                 nb_bins=8, alpha=2.), 'sq_out')

    def test_given_centers_clip(self):
        close(core.soft_quantize(jnp.asarray(G['sq_x'], jnp.float32),
                                 bin_centers=jnp.asarray(G['sq_centers']),
                                 nb_bins=None, alpha=1., min_clip=-2.5,
                                 max_clip=2.5), 'sq_out_centers')


class TestMetricGoldens:
    def test_mi_volumes(self):
        mi = ne.metrics.MutualInformation(nb_bins=16)
        got = mi.volumes(jnp.asarray(G['mi_x'], jnp.float32),
                         jnp.asarray(G['mi_y'], jnp.float32))
        close(got, 'mi_out', atol=2e-5)

    def test_mi_fused_kernel(self):
        mi = ne.metrics.MutualInformation(nb_bins=16)
        got = mi.volumes_fused(jnp.asarray(G['mi_x'], jnp.float32),
                               jnp.asarray(G['mi_y'], jnp.float32))
        close(got, 'mi_out', atol=2e-5)

    def test_dice(self):
        d = ne.metrics.Dice(dice_type='soft')
        got = d.dice(jnp.asarray(G['dice_true'], jnp.float32),
                     jnp.asarray(G['dice_pred'], jnp.float32))
        close(got, 'dice_out')

    def test_dice_laplace(self):
        d = ne.metrics.Dice(dice_type='soft', laplace_smoothing=1e-3)
        got = d.dice(jnp.asarray(G['dice_true'], jnp.float32),
                     jnp.asarray(G['dice_pred'], jnp.float32))
        close(got, 'dice_out_laplace')
