package org.apache.spark.graft

import org.apache.spark.SparkEnv

/** `SparkEnv.blockManager.diskBlockManager` is `private[spark]`; this shim
  * exposes THIS application's block-manager directories so
  * `duckdb_temporary_files()` lists only this engine's spill/shuffle files
  * — a bare `blockmgr-*` glob over the shared tmp dir would report OTHER
  * Spark applications' files on a multi-app box (r12 review finding). */
object BlockDirsShim {
  def localDirs(): Seq[java.io.File] = {
    val env = SparkEnv.get
    if (env == null) Nil
    else env.blockManager.diskBlockManager.localDirs.toSeq
  }
}
