"""
ne.io — native medical-image IO (NIfTI/MGH/npz, nibabel-free) and N-D
patch/quilt tiling (pystrum-free).
"""
from neurite_tpu.io.medio import (  # noqa: F401
    Volume, load_nii, save_nii, load_mgh, save_mgh, load_volfile,
    save_volfile,
)
from neurite_tpu.io.tiling import (  # noqa: F401
    patch_gen, patch_starts, grid_size, quilt, quilt_device,
)
