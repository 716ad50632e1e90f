package graft

/** Public API surface, mirroring the reference's explicit `__all__`
  * (`/root/reference/bonobo_sqlalchemy/_api.py:9-11`: exactly `Select`,
  * `InsertOrUpdate`, `__version__`). Users import `graft.api._` and get the
  * same two operators plus the extension surface; `PublicApiSpec` pins this
  * set the way `tests/test_publicapi.py` does for the reference.
  */
object api {
  val __version__ : String = "0.1.0"

  // The reference's two operators.
  type Select = sources.Select
  val Select = sources.Select
  val InsertOrUpdate = sinks.InsertOrUpdate

  // Their configuration / service surface.
  type SelectConfig = sources.SelectConfig
  val SelectConfig = sources.SelectConfig
  type UpsertConfig = sinks.UpsertConfig
  val UpsertConfig = sinks.UpsertConfig
  type ServiceRegistry = core.ServiceRegistry
  val ServiceRegistry = core.ServiceRegistry
  type JdbcEngine = core.JdbcEngine
  val JdbcEngine = core.JdbcEngine
  type Operation = core.Operation
  val Operation = core.Operation

  // Graph construction (Bonobo-core analog, SURVEY.md §2.2).
  type Graph = core.Graph
  val Graph = core.Graph
  type Chain = core.Chain
  val Chain = core.Chain
  type Node = core.Node
  val Node = core.Node

  // Error taxonomy (errors.py:6-11).
  type ProhibitedOperationError = core.ProhibitedOperationError
  type UnrecoverableOperationalError = core.UnrecoverableOperationalError

  // Backends a Select can run against.
  type ParquetCatalog = sources.ParquetCatalog
  val ParquetCatalog = sources.ParquetCatalog
  type FileCatalog = sources.FileCatalog
  val FileCatalog = sources.FileCatalog
  type JdbcBackend = sources.JdbcBackend
  val JdbcBackend = sources.JdbcBackend

  // Extension surface: sinks, operators, streaming (north-star additions).
  val SnapshotStore = sinks.SnapshotStore
  val JdbcUpsert = sinks.JdbcUpsert
  val JdbcDdl = sinks.JdbcDdl
  val ErrorChannel = core.ErrorChannel
  val Dedup = operators.Dedup
  val Similarity = operators.Similarity
  val Joins = operators.Joins
  val Sessions = operators.Sessions
  val Skew = operators.Skew
  val Multimodal = operators.Multimodal
  val Selection = operators.Selection
  val CorpusStats = operators.CorpusStats
  val Packing = operators.Packing
  val EventWindows = streaming.EventWindows
  val StreamOps = streaming.StreamOps
}
