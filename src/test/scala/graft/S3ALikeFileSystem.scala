package graft

/** Test-only filesystem that BEHAVES like the local disk but REPORTS the
  * `s3a` scheme — the cheapest honest way to exercise the object-store
  * branches (no-atomic-rename refusals, plain-overwrite fence fallbacks)
  * without a real object store in the offline sandbox. Registered per
  * test via `fs.s3a.impl` on the session's Hadoop conf; paths look like
  * `s3a:/tmp/...` and resolve to the same local files. */
class S3ALikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}
