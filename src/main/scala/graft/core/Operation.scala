package graft.core

/** Operation tokens gating what an upsert sink may do.
  *
  * Reference: symbolic constants `SELECT`/`INSERT`/`UPDATE` (Bonobo `Token`),
  * `/root/reference/bonobo_sqlalchemy/constants.py:3-5`, consumed by
  * `allowed_operations` (`writers.py:30-33`, gate at `writers.py:115-116` and
  * `writers.py:125-126`).
  */
sealed trait Operation extends Product with Serializable
object Operation {
  case object Select extends Operation
  case object Insert extends Operation
  case object Update extends Operation

  /** Reference default: `allowed_operations=(INSERT, UPDATE)`
    * (`writers.py:29-34`). */
  val defaultAllowed: Set[Operation] = Set(Insert, Update)
}
