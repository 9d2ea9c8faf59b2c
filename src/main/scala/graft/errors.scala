package graft

/** Error hierarchy — parity with the reference's exception surface
  * (reference: xorbits_sql/errors.py:1-26, exported from __init__).
  * `Engine.execute` wraps Spark's parse/analysis failures so callers can
  * catch engine errors without depending on Spark exception classes.
  */
class GraftError(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** A statement failed to parse/analyze/execute (reference ExecuteError). */
class ExecuteError(message: String, cause: Throwable = null)
  extends GraftError(message, cause)

/** A construct the engine does not support (reference UnsupportedError —
  * there: every function outside the implemented table,
  * executor.py:192-195; here: only unsupported dialect constructs, since
  * Spark's surface is a superset).
  */
class UnsupportedError(message: String, cause: Throwable = null)
  extends GraftError(message, cause)
