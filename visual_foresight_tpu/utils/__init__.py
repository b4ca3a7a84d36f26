from .hparams import HParams
from .logger import Logger
from .sync import SyncCounter, ManagedSyncCounter
