"""Make ``google.protobuf`` importable in environments without the real
package — by shipping a minimal pure-stdlib protobuf runtime.

Why: Spark 4's ``transformWithStateInPandas`` (typed per-key state:
ValueState/ListState/MapState/timers) speaks a protobuf protocol to the
JVM state server (``pyspark/sql/streaming/proto/StateMessage_pb2.py``).
This container has no ``google.protobuf`` and no pip — historically the
operator was env-gated (r2–r4 "missing" item #2). The shim under
``_protobuf_shim/google/protobuf`` implements exactly the runtime
surface that generated ``*_pb2`` modules and their pyspark consumers
use, from the PUBLIC protobuf documentation alone:

* the wire format (varints, tags, length-delimited fields — the
  "Protocol Buffers Encoding" spec),
* ``FileDescriptorProto`` parsing (field numbers from the public
  ``descriptor.proto``),
* proto3 message semantics (implicit presence for plain scalars,
  explicit presence for message/oneof/optional fields, last-wins and
  merge rules, unknown-field skipping).

The real package always wins when present: ``ensure_protobuf`` is a
no-op if ``import google.protobuf`` already succeeds.

Worker visibility: PySpark executors run separate Python interpreters.
``ensure_protobuf`` therefore also prepends the shim to ``PYTHONPATH``
so workers spawned by a LATER SparkSession inherit it, and
``streaming/stateful.py`` calls it at import time so workers that
unpickle our stateful processors install it before pyspark's lazy
``import google.protobuf`` executes (the state clients import the
generated module inside method bodies, never at module import).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

SHIM_ROOT = str(Path(__file__).resolve().parent / "_protobuf_shim")


def ensure_protobuf() -> str:
    """Return ``"real"`` if the genuine google.protobuf is importable,
    else install the shim on ``sys.path`` + ``PYTHONPATH`` and return
    ``"shim"``. Idempotent; safe to call from driver and executors."""
    try:
        import google.protobuf  # noqa: F401

        return "shim" if getattr(google.protobuf, "__shim__", False) else "real"
    except ImportError:
        pass
    if SHIM_ROOT not in sys.path:
        sys.path.insert(0, SHIM_ROOT)
    parts = os.environ.get("PYTHONPATH", "")
    if SHIM_ROOT not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            SHIM_ROOT + (os.pathsep + parts if parts else "")
        )
    import google.protobuf  # noqa: F401

    return "shim"
