"""
ne.utils — tensor ops (+ augment) namespace, mirroring the reference layout
(`neurite/tf/utils/__init__.py`): core ops are star-exported so
`ne.utils.interpn` etc. resolve; `augment` is a submodule.
"""
from neurite_tpu.utils.core import *  # noqa: F401,F403
from neurite_tpu.utils import augment  # noqa: F401
from neurite_tpu.utils.augment import (  # noqa: F401
    draw_perlin, random_blur_rescale, draw_perlin_full, draw_crop_mask,
)
from neurite_tpu.utils import spatial  # noqa: F401
from neurite_tpu.utils.spatial import *  # noqa: F401,F403  (exports `transform` fn)
from neurite_tpu.utils import seg  # noqa: F401
from neurite_tpu.utils import vae  # noqa: F401
from neurite_tpu.utils import model  # noqa: F401
from neurite_tpu.utils.model import (  # noqa: F401
    stack_models, mod_submodel, sub_apply, module_paths, reset_weights,
    copy_weights, diagram, param_count,
)
