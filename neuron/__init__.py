"""
Legacy compatibility alias: `import neuron` resolves to the `neurite` alias
(itself the TPU-native rebuild `neurite_tpu`).

The reference ships this second, deprecated package name from its pre-rename
era (`/root/reference/neuron/__init__.py:1-14`): it warns that `neuron` was
renamed to `neurite`, reports the importing file/line, and re-exports
everything. Same contract here; submodule imports (`neuron.layers` etc.)
resolve through the `neurite` meta-path finder to the one `neurite_tpu`
module object.
"""

import inspect
import warnings

# context=0 skips per-frame source reads (see neurite/__init__.py)
_frame = inspect.stack(context=0)[-1]
warnings.warn('the `neuron` package was renamed to `neurite`; here both '
              'resolve to the TPU-native rebuild `neurite_tpu` (imported '
              f'from {_frame.filename}:{_frame.lineno}). Please import '
              'neurite (or neurite_tpu) instead.',
              DeprecationWarning, stacklevel=2)

from neurite import *              # noqa: F401,F403,E402
import neurite as _ne              # noqa: E402
import importlib.abc as _abc       # noqa: E402
import importlib.util as _util     # noqa: E402
import sys as _sys                 # noqa: E402

__version__ = _ne.__version__


class _NeuronAliasFinder(_abc.MetaPathFinder, _abc.Loader):
    """Resolve `neuron.*` to the same module object as `neurite.*`."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname == 'neuron' or not fullname.startswith('neuron.'):
            return None
        return _util.spec_from_loader(fullname, self)

    def create_module(self, spec):
        import importlib
        target = 'neurite' + spec.name[len('neuron'):]
        mod = importlib.import_module(target)
        _sys.modules[spec.name] = mod
        return mod

    def exec_module(self, module):
        pass


if not any(isinstance(f, _NeuronAliasFinder) for f in _sys.meta_path):
    _sys.meta_path.append(_NeuronAliasFinder())
