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


def module_paths(model, rng, sample_input, **apply_kwargs):
    """
    List the '/'-joined module paths of every submodule reachable from a
    forward pass — the names accepted by `sub_apply`/`mod_submodel`
    (analogue of inspecting reference keras `model.layers` names).
    """
    variables = model.init(rng, jnp.asarray(sample_input), **apply_kwargs)
    _, state = model.apply(variables, jnp.asarray(sample_input),
                           capture_intermediates=True,
                           mutable=['intermediates'], **apply_kwargs)

    paths = []

    def walk(tree, prefix):
        for key, val in tree.items():
            if key == '__call__':
                paths.append('/'.join(prefix))
            elif isinstance(val, dict):
                walk(val, prefix + [key])

    walk(state['intermediates'], [])
    return sorted(p for p in paths if p)


def _navigate(tree, path):
    node = tree
    for part in path.split('/'):
        if part not in node:
            raise KeyError(
                f'module path {path!r} not found; available: '
                f'{sorted(k for k in node if k != "__call__")}')
        node = node[part]
    if '__call__' not in node:
        raise KeyError(f'{path!r} has no captured output')
    out = node['__call__']
    return out[0] if isinstance(out, tuple) and len(out) == 1 else out


def sub_apply(model, variables, inputs, until=None, inject=None, rngs=None,
              **apply_kwargs):
    """
    Run `model` cut at arbitrary interior modules — the functional
    replacement for reference `mod_submodel` keras graph surgery
    (`neurite/tf/utils/model.py:86-249`).

    until: module path ('enc/conv_down_1_0') or list of paths — return that
        module's OUTPUT (feature tap) instead of the model output; a list
        returns a dict {path: value}. Implemented with flax
        capture_intermediates.
    inject: dict {module path: value} — REPLACE the named modules' outputs
        with the given values (input-side cut: everything downstream sees the
        injected value; the module itself is never executed, and under jit
        XLA dead-code-eliminates the now-unused upstream). `inputs` then only
        sets shapes for the bypassed branch (zeros of the right shape work).
    Both combine: `sub_apply(m, v, dummy_x, until='dec/level_2',
    inject={'mid': z})` is "decoder from z, tapped mid-decoder".
    """
    import flax.linen as nn

    paths = ([until] if isinstance(until, str) else
             list(until) if until is not None else [])

    def run():
        if paths:
            out, state = model.apply(
                variables, inputs, rngs=rngs,
                capture_intermediates=lambda mdl, _:
                    '/'.join(mdl.path) in paths,
                mutable=['intermediates'], **apply_kwargs)
            taps = {p: _navigate(state['intermediates'], p) for p in paths}
            return taps[until] if isinstance(until, str) else taps
        return model.apply(variables, inputs, rngs=rngs, **apply_kwargs)

    if not inject:
        return run()

    def interceptor(next_fun, args, kwargs, context):
        key = '/'.join(context.module.path)
        if key in inject and context.method_name == '__call__':
            return inject[key]
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return run()


def mod_submodel(model, variables, sample_input, from_layer=None,
                 to_layer=None, rngs=None, **apply_kwargs):
    """
    Build a callable sub-model cut between two module paths — signature
    parity with reference `mod_submodel` (`model.py:86-249`: new_input_nodes
    -> `from_layer` injection point, output cut -> `to_layer` tap).

    Returns `fn(value)` mapping an activation for `from_layer`'s output to
    `to_layer`'s output (or the model output when `to_layer` is None). When
    `from_layer` is None the sub-model consumes regular model inputs.
    `sample_input` fixes the shapes of the bypassed input branch.
    """
    dummy = jnp.asarray(sample_input)

    def fn(value=None):
        if from_layer is not None:
            return sub_apply(model, variables, dummy, until=to_layer,
                             inject={from_layer: value}, rngs=rngs,
                             **apply_kwargs)
        inputs = dummy if value is None else jnp.asarray(value)
        return sub_apply(model, variables, inputs, until=to_layer,
                         rngs=rngs, **apply_kwargs)

    return fn


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


def robust_multi_gpu(train_step, verbose=True, **kwargs):
    """
    Data-parallel train-step wrapper with graceful single-device fallback.

    Reference `robust_multi_gpu` (`model.py:298-321`) wrapped a keras model
    in `multi_gpu_model` when more than one GPU was visible and returned it
    unchanged (with a message) otherwise. The SPMD equivalent operates on
    the TRAIN STEP, not the model (one logical model, compiler-partitioned):
    with >1 visible device it returns
    `parallel.make_sharded_train_step(train_step, create_mesh(data=N))`
    — batch sharded over a pure-data mesh, XLA inserting the gradient
    all-reduce — and with one device it returns the step unchanged. Feed
    the wrapped step with `parallel.shard_batch(batch, mesh)` (the mesh is
    available as `wrapped.mesh`). kwargs pass through to
    `make_sharded_train_step` (e.g. `param_specs`). For spatial sharding or
    custom mesh axes, use `neurite_tpu.parallel` directly.
    """
    n = len(jax.devices())
    if n <= 1:
        if verbose:
            print('robust_multi_gpu: one device visible — returning the '
                  'step unchanged')
        try:
            train_step.mesh = None
        except AttributeError:  # jitted callables reject new attributes
            pass
        return train_step
    from neurite_tpu import parallel
    mesh = parallel.create_mesh(data=n, space=1)
    if verbose:
        print(f'robust_multi_gpu: data-parallel over {n} devices')
    wrapped = parallel.make_sharded_train_step(train_step, mesh, **kwargs)
    wrapped.mesh = mesh
    return wrapped


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
