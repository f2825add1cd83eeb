"""
Compatibility alias: `import neurite` resolves to `neurite_tpu`.

Mirrors the reference's renamed-package shim (`neuron/__init__.py:1-14`),
which reports the importing file/line and re-exports everything, so existing
`import neurite as ne` user code runs against the TPU-native rebuild
unchanged.
"""

import inspect
import warnings

# context=0 skips per-frame source reads (inspect.stack default materializes
# source context for every frame on the import path)
frame = inspect.stack(context=0)[-1]
warnings.warn('`neurite` here is the TPU-native rebuild `neurite_tpu` '
              f'(imported from {frame.filename}:{frame.lineno}).',
              stacklevel=2)

from neurite_tpu import *          # noqa: F401,F403,E402
import neurite_tpu as _ne          # noqa: E402
import importlib as _importlib     # noqa: E402
import importlib.abc as _abc       # noqa: E402
import sys as _sys                 # noqa: E402

__version__ = _ne.__version__


class _AliasFinder(_abc.MetaPathFinder, _abc.Loader):
    """
    Resolve every `neurite.*` import to the SAME module object as
    `neurite_tpu.*` at import time — not a one-shot sys.modules snapshot,
    which only covered eagerly-imported submodules and re-executed lazy ones
    under the alias name (duplicate module state, e.g. a second
    `neurite.io.native` with its own ctypes handle).
    """

    def find_spec(self, fullname, path=None, target=None):
        if fullname == 'neurite' or not fullname.startswith('neurite.'):
            return None
        from importlib.machinery import ModuleSpec
        return ModuleSpec(fullname, self)

    def create_module(self, spec):
        real = _importlib.import_module(
            'neurite_tpu' + spec.name[len('neurite'):])
        # register under the alias so submodule attribute wiring sees it
        _sys.modules[spec.name] = real
        return real

    def exec_module(self, module):
        pass  # the real module is already executed


if not any(isinstance(f, _AliasFinder) for f in _sys.meta_path):
    _sys.meta_path.insert(0, _AliasFinder())

# modules already imported eagerly above get aliased immediately
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith('neurite_tpu.'):
        _sys.modules['neurite' + _name[len('neurite_tpu'):]] = _mod
