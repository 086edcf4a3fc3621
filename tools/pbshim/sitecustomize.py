"""Worker-side bootstrap for the host-discovered protobuf runtime.

Spark Python workers are fresh interpreters; the driver's sys.path
edits don't reach them. ``compat.protobuf_shim.ensure_protobuf``
prepends this directory to $PYTHONPATH and publishes the discovered
runtime dir via $SPARK_GRAFT_PB_RUNTIME, so every spawned interpreter
replays the same append + minor-version relax at startup. A no-op when
the env var is unset or the dir vanished. Never raises: a broken shim
must not take down unrelated Python processes that merely inherited
the environment.
"""

import os
import sys

_pb = os.environ.get("SPARK_GRAFT_PB_RUNTIME")
if _pb and os.path.isdir(_pb) and _pb not in sys.path:
    sys.path.append(_pb)  # append: must not shadow installed packages
    try:
        from google.protobuf import runtime_version as _rv

        if not getattr(_rv, "_spark_graft_relaxed", False):
            _orig = _rv.ValidateProtobufRuntimeVersion

            def _relaxed(domain, major, minor, patch, suffix, location):
                try:
                    _orig(domain, major, minor, patch, suffix, location)
                except Exception:
                    if major != _rv.MAJOR:
                        raise

            _rv.ValidateProtobufRuntimeVersion = _relaxed
            _rv._spark_graft_relaxed = True
    except Exception:  # noqa: BLE001 — bootstrap must never break startup
        pass
