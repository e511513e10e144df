package graft.ops.cdc

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic small-file publish: write-to-temp + rename into place with
  * NO-OVERWRITE semantics via FileContext (Options.Rename.NONE), plus
  * a read-back lost-update detector. The commit primitive shared by
  * every manifest-committed layout in this library (the upsert table's
  * version manifests, the IVF index's codebook manifests).
  *
  * On HDFS the rename is an atomic compare-and-publish. On the local
  * AbstractFileSystem the no-overwrite check is BEST-EFFORT
  * (getFileStatus-then-rename), so two racing commits could both
  * "succeed" with the last overwrite winning — the production contract
  * is HDFS rename atomicity or a conditional put (if-none-match) on
  * object stores; as a cheap lost-update DETECTOR everywhere else, the
  * published file is re-read after the rename and must byte-match what
  * this writer staged. A losing racer gets a clean
  * ConcurrentModificationException and must re-prepare from the new
  * state. Temp files use the `.tmp-` prefix (vacuum reclaims aged
  * orphans from crashed commits). */
object AtomicPublish {

  def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def publishNoOverwrite(fs: FileSystem, dest: Path, body: String): Unit = {
    val parent = dest.getParent
    fs.mkdirs(parent)
    val tmp = new Path(parent,
      s".tmp-${dest.getName}-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dest.toUri, fs.getConf)
      fc.rename(tmp.makeQualified(fs.getUri, fs.getWorkingDirectory),
        dest.makeQualified(fs.getUri, fs.getWorkingDirectory))
    } catch {
      case e: java.io.IOException =>
        fs.delete(tmp, false) // never leak the temp file
        if (e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
            fs.exists(dest))
          throw new java.util.ConcurrentModificationException(
            s"commit conflict: ${dest.getName} already published — " +
              s"another writer committed from the same base; re-prepare " +
              s"from the new state (${e.getMessage})")
        else throw e
    }
    // lost-update detector for stores whose no-overwrite rename is
    // check-then-act: what is published must be what WE staged
    val published = readText(fs, dest)
    if (published != body)
      throw new java.util.ConcurrentModificationException(
        s"commit conflict: ${dest.getName} was overwritten by a " +
          s"concurrent writer after our rename (non-atomic no-overwrite " +
          s"on this filesystem); re-prepare from the new state")
  }
}
