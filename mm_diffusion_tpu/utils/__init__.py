from . import logger
from .logger import KVLogger, configure, dumpkvs, get_current, log, logkv, logkv_mean

__all__ = [
    "logger",
    "KVLogger",
    "configure",
    "dumpkvs",
    "get_current",
    "log",
    "logkv",
    "logkv_mean",
]
