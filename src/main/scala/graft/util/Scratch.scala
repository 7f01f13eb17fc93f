package graft.util

import java.nio.file.{Files, Path, Paths}

/** Node-local scratch root for ephemeral harness state: bucketed index
  * tables, partitioned/z-ordered table copies, streaming-twin staging and
  * checkpoints. All of it is rebuilt per invocation and none of it needs
  * durability, so it belongs on the fastest local medium available — on
  * this single-node container that is `/dev/shm` (tmpfs; `/tmp` here is
  * disk-backed), on a production cluster it would be the node-local SSD
  * scratch or HDFS the operator explicitly passes. Resolution order:
  *
  *   1. `SPARK_GRAFT_SCRATCH` env (explicit operator choice);
  *   2. `/dev/shm` when present and writable;
  *   3. `java.io.tmpdir`.
  *
  * Everything under the root is either tracked by [[TempDirs]] (deleted at
  * JVM exit) or overwritten per run (the bucketed-table paths), so tmpfs
  * occupancy is bounded by one run's working set. */
object Scratch {
  lazy val base: Path = {
    val root = sys.env.get("SPARK_GRAFT_SCRATCH").map(Paths.get(_)).getOrElse {
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(System.getProperty("java.io.tmpdir", "/tmp"))
    }
    val dir = root.resolve("graft-scratch")
    Files.createDirectories(dir)
    dir
  }
}
