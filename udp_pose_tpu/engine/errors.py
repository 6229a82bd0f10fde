"""Engine exception taxonomy.

``EngineStateError`` marks *caller-resolvable* serving states (endpoint
disabled, engine not calibrated yet, batcher shut down) so the HTTP
layer can map them to 409 without also swallowing real runtime
failures: jaxlib's ``XlaRuntimeError`` subclasses ``RuntimeError``, so
catching bare ``RuntimeError`` for state errors would report a dead
device as a client-state conflict (and monitoring keyed on 5xx would
never fire).  Subclasses ``RuntimeError`` for backward compatibility
with callers that catch the old type.
"""


class EngineStateError(RuntimeError):
    """Serving-state condition the caller can resolve (409, not 500)."""
