from .config import get_instance, load_config, Registry
from .trees import tree_size_bytes

__all__ = ["get_instance", "load_config", "Registry", "tree_size_bytes"]
