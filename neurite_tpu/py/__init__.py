from neurite_tpu.py import utils
