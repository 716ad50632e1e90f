package graft

/** Mirrors `tests/test_publicapi.py:4-16`: the package's public surface is
  * exactly what the API object exports — `Select`, `InsertOrUpdate`,
  * `__version__` (plus the rebuild's config/graph surface). */
class PublicApiSpec extends SparkSpec {

  test("reference API triple is exported: Select, InsertOrUpdate, __version__") {
    api.__version__ shouldBe "0.1.0"
    api.Select("SELECT 1") shouldBe a[graft.sources.Select]
    api.InsertOrUpdate shouldBe graft.sinks.InsertOrUpdate
  }

  test("config surface mirrors the reference option sets") {
    // writers.py:23-35 option names -> UpsertConfig fields
    val u = api.UpsertConfig()
    u.discriminant shouldBe Seq("id")
    u.createdAtField shouldBe "created_at"
    u.updatedAtField shouldBe "updated_at"
    u.bufferSize shouldBe 1000
    u.allowedOperations shouldBe api.Operation.defaultAllowed
    // readers.py:45-47 -> SelectConfig
    api.SelectConfig().packSize shouldBe 1000
  }

  test("every declared query has an oracle") {
    // the last 5 rows-only entries (minhash/simhash/embcos pairs, lsh_topk,
    // group_sketch) graduated to bounded-assertion oracles in round 9
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet shouldBe Set.empty
    // no orphan oracles
    SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet shouldBe Set.empty
  }
}
