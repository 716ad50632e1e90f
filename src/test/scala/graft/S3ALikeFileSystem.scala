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

  // RawLocalFileSystem's statuses load permissions LAZILY via
  // `new java.io.File(path.toUri)`, which rejects the s3a scheme — so a
  // parquet listing through the shim would crash on an accident of the
  // shim, not a behavior under test. Return plain statuses with the
  // permission materialized; everything else is unchanged.
  private def scrub(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      null, null, st.getPath)

  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = scrub(super.getFileStatus(f))

  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(scrub)
}
