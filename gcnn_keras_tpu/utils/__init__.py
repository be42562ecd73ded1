from .checkpoint import save_checkpoint, load_checkpoint
from .devices import set_devices, device_info
from . import constants
