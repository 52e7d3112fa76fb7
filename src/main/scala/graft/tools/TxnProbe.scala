package graft.tools

import graft.lake.{LakeTable, TxnGroup}
import graft.util.Sessions

/** Crash-injection workload for multi-table transactions: one
  * [[TxnGroup]] commit upserting a deterministic batch into BOTH tables
  * (v = id + 10000, ts = 9). Armed crashpoints halt the JVM (exit 137,
  * no finally blocks) at each boundary of the 2PC:
  *
  *  - `txn.prepared.1` — after table A's prepare, before table B's
  *    (the classic "between the two publishes" torn-write window);
  *  - `txn.prepared.2` — both prepares published, decision not yet;
  *  - `txn.decided`    — decision committed, reservations still held.
  *
  * `TxnGroupSpec` asserts survivors never see a half-published pair and
  * that recovery rolls back (before decision) or completes (after).
  *
  * Usage: TxnProbe <tableDirA> <tableDirB> <rows>
  */
object TxnProbe {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val rows = args(2).toInt
    val spark = Sessions.local("txn-probe", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ta = LakeTable.load(spark, dirA)
    val tb = LakeTable.load(spark, dirB)
    def batch = (0 until rows)
      .map(i => (i, 9L, (i + 10000).toDouble)).toDF("id", "ts", "v")
    val txnId = TxnGroup.commit(Seq(
      TxnGroup.TxnUpsert(ta, batch), TxnGroup.TxnUpsert(tb, batch)))
    println(s"[txnprobe] committed $txnId")
    spark.stop()
  }
}
