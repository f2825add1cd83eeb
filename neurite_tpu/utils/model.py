"""
Model composition and weight utilities.

Capability parity with reference `neurite/tf/utils/model.py` — but where the
reference performs keras graph surgery on layer node graphs
(`stack_models`/`mod_submodel`, `model.py:36-249`), functional JAX makes
composition trivial: models are apply functions, so stacking is function
composition and "sub-models" are the explicit `mode=` sub-applies (see
`neurite_tpu.models.ae.AE`). Weight utilities operate on param pytrees.
"""

import jax
import jax.numpy as jnp
import numpy as np


def stack_models(apply_fns):
    """
    Compose apply functions end-to-end: stack_models([f, g, h])(x) = h(g(f(x))).

    The functional replacement for reference `stack_models`
    (`model.py:36-83`), which rebuilt a merged keras graph. Each entry is a
    ready-to-call fn (close over params/variables first).
    """
    fns = list(apply_fns)
    assert fns, 'need at least one model'

    def stacked(x, *args, **kwargs):
        out = fns[0](x, *args, **kwargs)
        for fn in fns[1:]:
            out = fn(out)
        return out

    return stacked


def mod_submodel(*args, **kwargs):
    """
    Reference `mod_submodel` (`model.py:86-249`) cut keras graphs at named
    layers. In functional JAX the capability is first-class: models expose
    explicit sub-applies (e.g. `AE.__call__(mode='encode'/'decode')`,
    `unet` encoder/decoder modules), so there is no graph to mutate.
    """
    raise NotImplementedError(
        'mod_submodel is keras graph surgery; use the explicit sub-apply '
        "modes instead (e.g. model.apply(vars, x, mode='encode'))")


def reset_weights(model, rng, sample_input, **init_kwargs):
    """
    Freshly re-initialized variables for `model` (ref `reset_weights`,
    `model.py:252-273`, which re-ran keras initializers in place; here init
    is already a pure function).
    """
    return model.init(rng, jnp.asarray(sample_input), **init_kwargs)


def copy_weights(src_variables, dst_variables, verbose=False):
    """
    Copy weights between variable pytrees by matching path and shape —
    reference `copy_weights` (`model.py:276-295`) matched layers by name.
    Leaves present in both trees with equal shapes are taken from src;
    everything else keeps the dst value. Returns a new pytree.
    """
    src_flat = dict(jax.tree_util.tree_flatten_with_path(src_variables)[0])
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst_variables)

    out = []
    for path, leaf in dst_flat:
        if path in src_flat and np.shape(src_flat[path]) == np.shape(leaf):
            out.append(src_flat[path])
            if verbose:
                print('copied', jax.tree_util.keystr(path))
        else:
            out.append(leaf)
            if verbose and path in src_flat:
                print('shape mismatch, kept dst:',
                      jax.tree_util.keystr(path))
    return jax.tree_util.tree_unflatten(treedef, out)


def robust_multi_gpu(*args, **kwargs):
    """
    Reference `robust_multi_gpu` (`model.py:298-321`) wrapped keras
    multi_gpu_model. Obsolete under SPMD: use `neurite_tpu.parallel`
    (mesh + pjit shardings) — one logical model, compiler-partitioned.
    """
    raise NotImplementedError(
        'use neurite_tpu.parallel.create_mesh + make_sharded_train_step')


def diagram(model, sample_input, **kwargs):
    """
    Text summary of a flax module (ref `diagram`, `model.py:324-329`, which
    rendered keras plot_model to a png). Returns the tabulate string.
    """
    import flax.linen as nn
    return nn.tabulate(model, jax.random.PRNGKey(0), **kwargs)(
        jnp.asarray(sample_input))


def param_count(variables):
    """Total number of scalar parameters in a variables/params pytree."""
    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(variables))
