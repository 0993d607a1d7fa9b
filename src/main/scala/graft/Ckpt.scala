package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Eager lineage-truncating checkpoint with SERIALIZED block storage.
  *
  * `localCheckpoint(true)` defaults to MEMORY_AND_DISK, which keeps every
  * checkpointed row live as a deserialized JVM object. The pipeline
  * checkpoints several mention-scale frames (mentions, candidate lists,
  * linked, triples input), so at 10^5-10^6 docs per JVM tens of millions
  * of row objects sit in the old generation for the whole job — and
  * full-GC cost scales with LIVE OBJECT COUNT times collection frequency.
  * Measured at 640k docs / local[8]: the embed-cache stage spent 849 of
  * 1022 core-s (83%) in GC, turning a linear plan superlinear.
  * MEMORY_AND_DISK_SER stores each partition as one compressed byte
  * buffer: same reuse semantics, O(partitions) live objects, GC flat.
  */
object Ckpt {
  /** Storage knob: system property graft.ckpt.level (set e.g. by Bench
    * before building cluster-mode plans) falls back to env
    * SPARK_GRAFT_CKPT_LEVEL. "deser" restores the Spark default
    * (deserialized rows); "disk" forces DISK_ONLY — on multi-executor
    * runs checkpoint blocks then live on (tmpfs-backed) executor disk,
    * putting zero pressure on the storage memory pool whose eviction
    * storms starved small executors.
    */
  def storage: StorageLevel =
    sys.props.get("graft.ckpt.level")
      .orElse(sys.env.get("SPARK_GRAFT_CKPT_LEVEL"))
      .getOrElse("ser") match {
      case "deser" => StorageLevel.MEMORY_AND_DISK
      case "disk" => StorageLevel.DISK_ONLY
      case _ => StorageLevel.MEMORY_AND_DISK_SER
    }
  def apply[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(true, storage)
}
