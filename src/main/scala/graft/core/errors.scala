package graft.core

/** Error taxonomy mirroring `/root/reference/bonobo_sqlalchemy/errors.py:6-11`.
  *
  * Fatal errors (connection failure at setup, `writers.py:47-51`) abort the
  * Spark job by throwing on the driver/executor; row-level errors go to the
  * error side-channel (see [[graft.core.ErrorChannel]]) — Spark rows cannot
  * carry `Throwable`s through exchanges, so they are serialized to strings.
  */
class ProhibitedOperationError(msg: String) extends RuntimeException(msg)

/** Fatal, unrecoverable failure of an external operation (errors.py:9-11):
  * kills the node/job rather than being retried or routed downstream. */
class UnrecoverableOperationalError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)
