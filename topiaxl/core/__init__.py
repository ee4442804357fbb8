from .attrdict import AttrDict
from .config import load_config, merge_dotlist, build, register, resolve

__all__ = ["AttrDict", "load_config", "merge_dotlist", "build", "register", "resolve"]
