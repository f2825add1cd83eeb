"""
Example: anatomical-priors VAE with sparse-observation imputation
(BASELINE.md config #4; Dalca et al., CVPR 2018 workflow).

Two pieces:
1. a convolutional VAE over full volumes (prior head optional);
2. SpatiallySparse_Dense encode/decode for sparsely-observed inputs
   (e.g. sparse slice acquisitions): the same weight matrix serves a
   per-sample masked least-squares encode and a dense decode.

Run: python examples/anatomical_priors_vae.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training
from neurite_tpu.utils import vae as vae_utils


def main():
    size = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, size, size, size, 1)), jnp.float32)

    # 1. conv VAE, trained to reconstruct
    model = ne.models.ae(nb_features=8, input_shape=(size,) * 3 + (1,),
                         nb_levels=3, conv_size=3, nb_labels=1,
                         enc_size=(4, 4, 4, 8), ae_type='conv', do_vae=True,
                         final_pred_activation='linear')
    state = training.create_train_state(
        model, {'params': jax.random.PRNGKey(0),
                'sample': jax.random.PRNGKey(1)}, x, optax.adam(1e-3))
    mse = ne.losses.MeanSquaredErrorProb().loss
    step = jax.jit(training.make_train_step(
        mse, rng_names=('dropout', 'sample')))
    for i in range(10):
        state, metrics = step(state, (x, x), jax.random.PRNGKey(i))
    print('VAE loss:', float(metrics['loss']))

    # latent analysis: stats + decode extraction
    variables = {'params': state.params, **state.variables}
    stats = vae_utils.latent_stats(model, variables,
                                   iter(lambda: x, None), nb_batches=2)
    print('latent mu shape:', stats['mu'].shape)

    # 2. sparse-observation imputation layer
    layer = ne.layers.SpatiallySparse_Dense(input_shape=(size, size),
                                            output_len=16)
    y_full = jnp.asarray(rng.normal(size=(4, size, size)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(4, size, size)) > 0.5, jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), [y_full * mask, mask])
    z = layer.apply(v, [y_full * mask, mask])       # masked lstsq encode
    recon = layer.apply(v, z)                       # dense decode
    print('imputation: z', z.shape, '-> recon', recon.shape)
    return {'loss': float(metrics['loss']), 'mu_shape': stats['mu'].shape,
            'z_shape': z.shape, 'recon_shape': recon.shape}


if __name__ == '__main__':
    main()
