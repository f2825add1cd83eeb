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
import sys as _sys                 # noqa: E402

__version__ = _ne.__version__

# make `neurite.<submodule>` / `from neurite.x import y` resolve to the
# (eagerly imported) neurite_tpu modules
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith('neurite_tpu.'):
        _sys.modules['neurite' + _name[len('neurite_tpu'):]] = _mod
