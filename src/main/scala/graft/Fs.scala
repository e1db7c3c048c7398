package graft

/** Tiny local-FS helpers shared by Verify and the derived-store builders
  * (one copy — the delete guard was bug-fixed once already; drift risk is
  * real). */
object Fs {
  /** Recursive delete that FAILS LOUDLY when the target survives: a
    * silent partial delete would let a consumer read stale output — the
    * exact hazard callers use this to prevent. listFiles() is null on
    * I/O error (not just empty), which also ends in the exists() check
    * throwing. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    if (f.exists())
      throw new java.io.IOException(s"could not delete ${f.getPath}")
  }
}
