"""Config system: JSON config wrapper + logger factory.

API parity with the reference's ConfigParser
(reference: ribodetector/parse_config.py:11-92): ``from_json``, dict-style
``__getitem__``, reflective ``init_obj``, and ``get_logger`` with the same
log levels, message format and optional file handler. The default config
lives next to the package (config.json), like the reference's
(ribodetector/config.json, loaded at detect.py:802-806).
"""

import json
import logging
import os
from functools import partial
from pathlib import Path

PACKAGE_DIR = os.path.dirname(os.path.abspath(__file__))
DEFAULT_CONFIG = os.path.join(PACKAGE_DIR, "config.json")


def cache_dir() -> str:
    """Shared on-disk cache location (persistent XLA compile cache, parity
    pass markers): $RIBODETECTOR_TPU_CACHE or ~/.cache/ribodetector_tpu.
    One resolver so the compile cache and the markers can never split."""
    return os.environ.get(
        "RIBODETECTOR_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ribodetector_tpu"),
    )

LOG_LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


class ConfigParser:
    def __init__(self, config: dict):
        self.config = config
        self.log_levels = LOG_LEVELS

    @classmethod
    def from_json(cls, config_json):
        with open(Path(config_json), "rt") as fh:
            return cls(json.load(fh))

    def __getitem__(self, name):
        return self.config[name]

    def get(self, name, default=None):
        return self.config.get(name, default)

    def init_obj(self, name, module, *args, **kwargs):
        """`config.init_obj('arch', module)` -> `module.<type>(**<args>)`."""
        module_name = self[name]["type"]
        module_args = dict(self[name]["args"])
        assert all(
            k not in module_args for k in kwargs
        ), "Overwriting kwargs given in config file is not allowed"
        module_args.update(kwargs)
        return getattr(module, module_name)(*args, **module_args)

    def init_ftn(self, name, module, *args, **kwargs):
        module_name = self[name]["type"]
        module_args = dict(self[name]["args"])
        assert all(
            k not in module_args for k in kwargs
        ), "Overwriting kwargs given in config file is not allowed"
        module_args.update(kwargs)
        return partial(getattr(module, module_name), *args, **module_args)

    _FMT = "%(asctime)s : %(levelname)s  %(message)s"
    _DATEFMT = "%Y-%m-%d %H:%M:%S"

    def get_logger(self, name, verbosity=2, logfile=None):
        assert verbosity in self.log_levels, (
            "verbosity option {} is invalid. Valid options are {}.".format(
                verbosity, self.log_levels.keys()
            )
        )
        root = logging.getLogger()
        root.setLevel(self.log_levels[verbosity])
        fmt = logging.Formatter(self._FMT, self._DATEFMT)
        # FILE handlers are preserved across calls: basicConfig(force=True)
        # here closed and replaced every root handler, silently detaching an
        # earlier --log file handler when a second Predictor was built in
        # the same process (serve mode). The STREAM handler is recreated per
        # call so it binds the caller's current sys.stderr.
        for h in list(root.handlers):
            if isinstance(h, logging.StreamHandler) and not isinstance(
                h, logging.FileHandler
            ):
                root.removeHandler(h)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        root.addHandler(sh)
        if logfile is not None and not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(logfile)
            for h in root.handlers
        ):
            fh = logging.FileHandler(logfile, mode="w")
            fh.setFormatter(fmt)
            root.addHandler(fh)
        return logging.getLogger(name)


class colors:
    """ANSI colors for log cosmetics (reference: detect.py:744-761)."""

    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKCYAN = "\033[96m"
    OKGREEN = "\033[92m"
    OKYELLOW = "\033[33m"
    OKMAG = "\033[35m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"
    UPDATE = "\033[F"
