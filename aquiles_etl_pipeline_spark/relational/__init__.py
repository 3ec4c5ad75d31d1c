from .catalog import QuerySpec, load, register, registry

__all__ = ["QuerySpec", "load", "register", "registry"]
