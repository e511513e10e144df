package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared bench-fixture discipline for the oracled LIFECYCLE keys
  * (q_cdc_dml_sql / ddl_sql / delete_mor / clone — r16 verdict #3):
  * the pristine init state is prepared ONCE per (session, sf); the
  * first call pays the init write (manifest v1), and every later call
  * rolls the table back to v1 via [[PartitionedUpsert.restoreVersion]]
  * — a METADATA-ONLY commit (v1's manifest republished verbatim; not
  * a byte of data moves, and the pristine snapshot expression is not
  * even evaluated) — so warm bench reps pay only the lifecycle
  * statements under measurement, never the fixture rebuild. Results
  * are identical by construction: a restored head IS v1's state, and
  * the statements that follow are deterministic functions of it.
  * Safe by construction too: fixture paths live under the per-PID
  * fixture root (Scans.fixtureDir), so the only possible prior state
  * at `path` is this session's own committed chain, whose v1 is
  * always the pristine init (a crash mid-lifecycle leaves a chain the
  * restore rolls straight back). */
private[graft] object LifecycleFixture {

  /** Ensure `path` holds the pristine snapshot state: init on first
    * call (cold — evaluates `snapshot`), restore-to-v1 after (warm —
    * metadata-only, `snapshot` untouched). */
  def pristine(spark: SparkSession, path: String, keyCol: String,
               nBuckets: Int,
               layout: String = PartitionedUpsert.LayoutHash)
              (snapshot: => DataFrame): Unit =
    PartitionedUpsert.currentManifest(spark, path) match {
      // already AT v1 → true no-op (ADVICE r17: a never-written
      // fixture like clone's source must not grow its manifest chain
      // by one restore commit per warm rep — the restore is for
      // tables the measured statements actually mutated)
      case Some(m) if m.version == 1L => ()
      case Some(_) => PartitionedUpsert.restoreVersion(spark, path, 1L)
      case None =>
        PartitionedUpsert.init(snapshot, path, keyCol, nBuckets,
          layout = layout)
    }
}
