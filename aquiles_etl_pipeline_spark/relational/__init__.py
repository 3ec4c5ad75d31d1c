from .catalog import QuerySpec, load, register, registry
from . import llm_queries  # noqa: F401 — registers q21+ into the registry
from . import stream_queries  # noqa: F401 — registers q30+ into the registry
from . import join_queries  # noqa: F401 — registers q36+ into the registry
from . import etl_pipeline_query  # noqa: F401 — registers q41 into the registry
from . import timeseries  # noqa: F401 — registers q61 into the registry
from . import round4_queries  # noqa: F401 — registers q101+ into the registry
from . import scale_queries  # noqa: F401 — registers q111+ into the registry
from . import sketch_queries  # noqa: F401 — registers q128+ into the registry
from . import graph  # noqa: F401 — registers q134 into the registry
from . import round5_queries  # noqa: F401 — registers q144+ into the registry
from . import round5b_queries  # noqa: F401 — registers q155+ into the registry
from . import round5c_queries  # noqa: F401 — registers q166+ into the registry
from . import round5d_queries  # noqa: F401 — registers q174+ into the registry
from . import round6_queries  # noqa: F401 — registers q217+ into the registry
from . import round6b_queries  # noqa: F401 — registers q248+ into the registry
from . import round7_queries  # noqa: F401 — registers q289+ into the registry
from . import round7b_queries  # noqa: F401 — registers q314+ into the registry
from . import round8_queries  # noqa: F401 — registers q328+ into the registry
from . import round9_queries  # noqa: F401 — registers q351+ into the registry
from . import round10_queries  # noqa: F401 — registers q367+ into the registry
from . import round10b_queries  # noqa: F401 — registers q372+ into the registry
from . import round10c_queries  # noqa: F401 — registers q378+ into the registry
from . import round10d_queries  # noqa: F401 — registers q384+ into the registry
from . import round10e_queries  # noqa: F401 — registers q390+ into the registry

__all__ = ["QuerySpec", "load", "register", "registry"]
