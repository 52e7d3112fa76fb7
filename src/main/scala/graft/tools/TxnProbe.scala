package graft.tools

import graft.lake.{LakeTable, TxnGroup}
import graft.util.Sessions

/** Crash-injection workload for multi-table transactions: one
  * [[TxnGroup]] commit upserting a deterministic batch into N tables
  * (v = id + 10000, ts = 9). Armed crashpoints halt the JVM (exit 137,
  * no finally blocks) at each boundary of the 2PC:
  *
  *  - `txn.prepared.k` — after the k-th prepare (in COMPLETION order —
  *    prepares run in parallel, so other tables' prepares may be
  *    anywhere from unstarted to published when the halt lands; the
  *    recovery matrix must converge from any such interleaving);
  *  - `txn.decided`    — decision committed, reservations still held.
  *
  * `TxnGroupSpec` asserts survivors never see a half-published set and
  * that recovery rolls back (before decision) or completes (after).
  *
  * Usage: TxnProbe <tableDir1> ... <tableDirN> <rows>
  */
object TxnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args.dropRight(1)
    val rows = args.last.toInt
    val spark = Sessions.local("txn-probe", "4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tables = dirs.map(d => LakeTable.load(spark, d))
    def batch = (0 until rows)
      .map(i => (i, 9L, (i + 10000).toDouble)).toDF("id", "ts", "v")
    val txnId = TxnGroup.commit(
      tables.map(t => TxnGroup.TxnUpsert(t, batch)).toSeq)
    println(s"[txnprobe] committed $txnId")
    spark.stop()
  }
}
