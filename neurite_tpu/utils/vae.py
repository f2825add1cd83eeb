"""
(V)AE latent-space analysis tools.

Capability parity with reference `neurite/tf/utils/vae.py` (file:line cites
per function), re-designed functionally: where the reference performs keras
graph surgery (`extract_z_dec` via `mod_submodel`, `vae.py:45-90`) and TF1
session gradients (`z_effect`, `vae.py:93-128`), here the model exposes
explicit `mode='encode'/'decode'` sub-applies and gradients are `jax.jacrev`.
"""

import jax
import jax.numpy as jnp
import numpy as np


def enc_output_shape(model, variables, sample_input):
    """Shape [*spatial, C] of the encoder output feeding the AE bottleneck
    (what the bottleneck decode must reconstruct — NOT the latent shape)."""
    outs = jax.eval_shape(
        lambda v, x: model.apply(v, x, return_parts=True,
                                 rngs={'sample': jax.random.PRNGKey(0)}),
        variables,
        jax.ShapeDtypeStruct(np.shape(sample_input), jnp.float32))
    return outs[2].shape[1:]    # (out, mid_out, enc_out)


def extract_z_dec(model, variables, sample_input, sample_rng=None):
    """
    Return (decode_fn, z_shape): decode_fn(z) maps latent batches to model
    outputs — the functional equivalent of reference `extract_z_dec`
    (`vae.py:45-90`, which rebuilds a keras submodel cut at the sample layer).
    """
    # AE-style models need the encoder-output shape for their decode path;
    # SingleAE-style models take out_shape instead and don't accept enc_shape
    import inspect
    call_params = inspect.signature(type(model).__call__).parameters
    enc_shape = enc_output_shape(model, variables, sample_input) \
        if 'enc_shape' in call_params else None

    rngs = {'sample': sample_rng} if sample_rng is not None else None
    z = model.apply(variables, jnp.asarray(sample_input, jnp.float32),
                    mode='encode', rngs=rngs or
                    {'sample': jax.random.PRNGKey(0)})
    z_shape = z.shape[1:]

    def decode_fn(zz):
        kwargs = {'mode': 'decode'}
        if enc_shape is not None:
            kwargs['enc_shape'] = enc_shape
        elif 'out_shape' in call_params:
            kwargs['out_shape'] = tuple(np.shape(sample_input)[1:])
        return model.apply(variables, jnp.asarray(zz, jnp.float32), **kwargs)

    return decode_fn, z_shape


def z_effect(decode_fn, z_mu, portion=None):
    """
    Mean absolute effect of each latent dimension on the output:
    mean_v |d out / d z_i| evaluated at `z_mu` [bs, *z_shape].

    Parity: reference `vae.py:93-128` (TF1 `K.gradients` loop -> one
    `jax.jacrev`).
    """
    z_mu = jnp.asarray(z_mu, jnp.float32)

    def mean_abs_grad(z_single):
        jac = jax.jacrev(lambda z: decode_fn(z[None])[0])(z_single)
        # jac: [*out_shape, *z_shape] -> mean |.| over output dims
        out_ndim = jac.ndim - z_single.ndim
        return jnp.mean(jnp.abs(jac), axis=tuple(range(out_ndim)))

    effects = jax.vmap(mean_abs_grad)(z_mu)     # [bs, *z_shape]
    if portion is not None:
        effects = effects[:int(portion * effects.shape[0])]
    return jnp.mean(effects, 0)


def sample_dec(decode_fn, z_shape, nb_samples=1, seed=None, z_std=1.,
               sweep_dim=None, sweep_range=(-3., 3.)):
    """
    Decode latent samples: random z ~ N(0, z_std) draws, or (when `sweep_dim`
    is set) a linear sweep of one latent dimension with the others at zero.

    Parity: reference `sample_dec` (`vae.py:131-193`).
    """
    if sweep_dim is not None:
        z = np.zeros((nb_samples,) + tuple(z_shape), np.float32)
        sweep = np.linspace(*sweep_range, nb_samples)
        flat = z.reshape(nb_samples, -1)
        flat[:, sweep_dim] = sweep
        z = flat.reshape(z.shape)
        z = jnp.asarray(z)
    else:
        key = seed if hasattr(seed, 'dtype') else \
            jax.random.PRNGKey(0 if seed is None else seed)
        z = z_std * jax.random.normal(key, (nb_samples,) + tuple(z_shape))
    return decode_fn(z), z


def sweep_dec_given_x(model, variables, decode_fn, x1, x2, nb_steps=10,
                      sample_rng=None):
    """
    Decode a linear latent interpolation between the encodings of two inputs.

    Parity: reference `sweep_dec_given_x` (`vae.py:196-241`).
    """
    rngs = {'sample': sample_rng if sample_rng is not None
            else jax.random.PRNGKey(0)}
    z1 = model.apply(variables, jnp.asarray(x1, jnp.float32), mode='encode',
                     rngs=rngs)
    z2 = model.apply(variables, jnp.asarray(x2, jnp.float32), mode='encode',
                     rngs=rngs)
    alphas = jnp.linspace(0., 1., nb_steps).reshape(
        (-1,) + (1,) * z1.ndim)
    z = (1. - alphas) * z1[None] + alphas * z2[None]      # [S, bs, *z]
    z = z.reshape((-1,) + z1.shape[1:])
    return decode_fn(z), z


def pca_init_dense(model, variables, x_batch,
                   mu_dense_path=('mid', 'ae_mu_enc_dense'),
                   dec_dense_path=('mid', 'ae_dense_dec'), whiten=False,
                   sample_rng=None):
    """
    Initialize a dense (V)AE bottleneck from the PCA of the pre-bottleneck
    encoder activations of `x_batch`: the mu Dense gets the (optionally
    whitened) principal axes, the decode Dense their transpose, biases center
    the data — so decode(encode(x)) ~= the PCA reconstruction.

    Parity: reference `pca_init_dense` / `model_output_pca`
    (`vae.py:244-375`; sklearn PCA -> numpy SVD). `*_path` are key tuples
    into variables['params'] naming the Dense layers (defaults match the AE
    builder). Returns updated `variables` (pure — input not mutated).
    """
    rngs = {'sample': sample_rng if sample_rng is not None
            else jax.random.PRNGKey(0)}
    out = model.apply(variables, jnp.asarray(x_batch, jnp.float32),
                      return_parts=True, rngs=rngs)
    enc_out = out[2]            # (out, mid_out, enc_out) from AE.__call__
    acts = np.asarray(enc_out).reshape(enc_out.shape[0], -1)
    return pca_init_dense_from_acts(variables, acts, mu_dense_path,
                                    dec_dense_path, whiten=whiten)


def pca_init_dense_from_acts(variables, acts, mu_dense_path, dec_dense_path,
                             whiten=False):
    """
    PCA-initialize dense bottleneck weights from precomputed pre-dense
    activations `acts` [N, D]. See `pca_init_dense`. Returns new variables.

    The mu Dense kernel [D, d] gets the top-d principal axes (scaled by
    1/sqrt(eigval) when `whiten`), its bias -W^T mean; the decode Dense
    kernel [d, D] gets the transposed axes and bias the mean — so
    decode(encode(x)) ~= PCA reconstruction of x (reference check
    `vae.py:357-373`).
    """
    import flax
    acts = np.asarray(acts, np.float64)
    acts2d = acts.reshape(acts.shape[0], -1)
    mean = acts2d.mean(0)
    centered = acts2d - mean
    _, s, vt = np.linalg.svd(centered, full_matrices=False)

    params = flax.core.unfreeze(variables['params'])

    def get_node(path):
        node = params
        for k in path:
            node = node[k]
        return node

    mu_dense = get_node(mu_dense_path)
    d = mu_dense['kernel'].shape[1]
    w = vt[:d].T                                   # [D, d]
    if whiten:
        scale = s[:d] / np.sqrt(max(acts2d.shape[0] - 1, 1))
        w = w / np.maximum(scale, 1e-8)
    mu_dense['kernel'] = jnp.asarray(w, jnp.float32)
    if 'bias' in mu_dense:
        mu_dense['bias'] = jnp.asarray(-mean @ w, jnp.float32)

    dec_dense = get_node(dec_dense_path)
    w_dec = vt[:d]                                 # [d, D]
    if whiten:
        w_dec = w_dec * np.maximum(scale, 1e-8)[:, None]
    dec_dense['kernel'] = jnp.asarray(w_dec, jnp.float32)
    if 'bias' in dec_dense:
        dec_dense['bias'] = jnp.asarray(mean, jnp.float32)

    new_vars = dict(variables)
    new_vars['params'] = flax.core.freeze(params) \
        if isinstance(variables['params'], flax.core.FrozenDict) else params
    return new_vars


def latent_stats(model, variables, data_iter, nb_batches=10,
                 sample_rng=None):
    """
    Collect mu / log-var statistics over a generator of input batches via the
    sown 'intermediates' (ae_mu / ae_sigma).

    Parity: reference `latent_stats` (`vae.py:378-404`).
    Returns dict with 'mu' [N, *z] and (if variational) 'logvar' [N, *z].
    """
    mus, logvars = [], []
    rngs = {'sample': sample_rng if sample_rng is not None
            else jax.random.PRNGKey(0)}
    for _ in range(nb_batches):
        batch = next(data_iter)
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        _, inter = model.apply(
            variables, jnp.asarray(x, jnp.float32), rngs=rngs,
            mutable=['intermediates'])
        flat = flatten_intermediates(inter['intermediates'])
        if 'ae_mu' in flat:
            mus.append(np.asarray(flat['ae_mu']))
        if 'ae_sigma' in flat:
            logvars.append(np.asarray(flat['ae_sigma']))
    out = {}
    if mus:
        out['mu'] = np.concatenate(mus, 0)
    if logvars:
        out['logvar'] = np.concatenate(logvars, 0)
    return out


def flatten_intermediates(tree, out=None):
    """Flatten a sown-intermediates tree to {leaf_name: last_value}."""
    out = {} if out is None else out
    for k, v in tree.items():
        if isinstance(v, dict):
            flatten_intermediates(v, out)
        else:
            # sow stores tuples of values
            out[k] = v[-1] if isinstance(v, (tuple, list)) else v
    return out


def latent_stats_plots(stats, figsize=(12, 4)):
    """
    Scatter + sorted-statistic plots of latent mu/log-var
    (ref `latent_stats_plots`, `vae.py:405-498`). Returns (fig, axes).
    """
    import matplotlib.pyplot as plt
    mu = stats['mu'].reshape(stats['mu'].shape[0], -1)
    has_lv = 'logvar' in stats
    ncols = 3 if has_lv else 2
    fig, axes = plt.subplots(1, ncols, figsize=figsize)
    axes[0].scatter(mu[:, 0], mu[:, 1] if mu.shape[1] > 1 else mu[:, 0],
                    s=4, alpha=0.5)
    axes[0].set_title('latent mu scatter (dims 0,1)')
    order = np.argsort(np.abs(mu).mean(0))[::-1]
    axes[1].plot(np.abs(mu).mean(0)[order])
    axes[1].set_title('sorted mean |mu|')
    if has_lv:
        lv = stats['logvar'].reshape(stats['logvar'].shape[0], -1)
        axes[2].plot(np.sort(np.exp(lv).mean(0))[::-1])
        axes[2].set_title('sorted mean var')
    fig.tight_layout()
    return fig, axes


def model_output_pca(apply_fn, data_iter, nb_batches, nb_components=None):
    """
    PCA of a model-output (or any apply_fn-output) distribution gathered over
    a generator — reference `model_output_pca` (`vae.py:322-355`, sklearn PCA
    -> numpy SVD). Returns (components [k, D], explained_variance [k],
    mean [D], projected [N, k]).
    """
    outs = []
    for _ in range(nb_batches):
        batch = next(data_iter)
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        out = apply_fn(jnp.asarray(x, jnp.float32))
        outs.append(np.asarray(out).reshape(np.shape(out)[0], -1))
    data = np.concatenate(outs, 0)
    mean = data.mean(0)
    centered = data - mean
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    k = nb_components or vt.shape[0]
    var = (s ** 2) / max(data.shape[0] - 1, 1)
    proj = centered @ vt[:k].T
    return vt[:k], var[:k], mean, proj
