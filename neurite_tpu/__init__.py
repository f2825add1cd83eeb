"""
neurite_tpu — a TPU-native (JAX/XLA/Pallas/pjit) medical-image neural-network
toolbox with the capabilities of adalca/neurite.

Import as `import neurite_tpu as ne`; submodules mirror the reference public
API (`ne.utils`, `ne.layers`, `ne.models`, `ne.metrics`, `ne.losses`, ...).
"""

__version__ = '0.1.0'

from neurite_tpu import py  # noqa: F401
from neurite_tpu import utils  # noqa: F401
from neurite_tpu import ops  # noqa: F401
from neurite_tpu import metrics  # noqa: F401
from neurite_tpu import losses  # noqa: F401
from neurite_tpu import regularizers  # noqa: F401
from neurite_tpu import layers  # noqa: F401
from neurite_tpu import models  # noqa: F401
from neurite_tpu import training  # noqa: F401
from neurite_tpu import parallel  # noqa: F401
from neurite_tpu import io  # noqa: F401
from neurite_tpu import generators  # noqa: F401
from neurite_tpu import dataproc  # noqa: F401
from neurite_tpu import data  # noqa: F401
from neurite_tpu import callbacks  # noqa: F401
from neurite_tpu import modelio  # noqa: F401
from neurite_tpu.py import plot  # noqa: F401
