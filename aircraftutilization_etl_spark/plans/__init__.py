from .catalog import CATALOG, QueryDef, query

# Importing the modules registers their queries into CATALOG.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_tpch  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import scale  # noqa: E402,F401
from . import warehouse  # noqa: E402,F401
from . import profile  # noqa: E402,F401
from . import contamination  # noqa: E402,F401
from . import packing  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import chunking  # noqa: E402,F401
from . import frequency  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import flight_parity  # noqa: E402,F401
from . import classifier  # noqa: E402,F401
from . import geo  # noqa: E402,F401
from . import relational_tpch2  # noqa: E402,F401
from . import quota  # noqa: E402,F401
from . import url  # noqa: E402,F401

__all__ = ["CATALOG", "QueryDef", "query"]
