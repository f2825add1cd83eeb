from neurite_tpu.py import utils
from neurite_tpu.py import data
from neurite_tpu.py import plot
