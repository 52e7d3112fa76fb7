package graft.cdc

/** Canal (MySQL binlog) JSON envelope — shape per reference
  * cdc/model/CanalDataModel.scala:3-17 and the inline fixtures at
  * CanalParser.scala:40-73.
  */
case class CanalEnvelope(
    data: Seq[Map[String, String]] = null,
    database: String = null,
    es: Long = 0L,
    id: Long = 0L,
    isDdl: Boolean = false,
    mysqlType: Map[String, String] = null,
    old: Seq[Map[String, String]] = null,
    pkNames: Seq[String] = null,
    sql: String = null,
    sqlType: Map[String, Int] = null,
    table: String = null,
    ts: Long = 0L,
    `type`: String = null
)

/** Normalized CDC record (reference cdc/model/HudiDataModel.scala:3-8):
  * target db/table, lake write op, and the row payloads as JSON strings.
  * `ts` is the binlog execution timestamp (CanalEnvelope.ts) and `seq`
  * the binlog event id (CanalEnvelope.id): together with the row's index
  * inside the envelope they give a total, DATA-DERIVED order of
  * operations on the same key within a micro-batch — no dependence on
  * Spark partition layout.
  */
case class CdcRecord(
    database: String,
    table: String,
    op: String, // insert | upsert | delete (reference HudiOP.scala:3-7)
    rows: Seq[String],
    ts: Long = 0L,
    seq: Long = 0L
)

object CdcOp {
  // reference CanalOP.scala:3-7 → HudiOP.scala:3-7 mapping
  val Insert = "insert"
  val Upsert = "upsert"
  val Delete = "delete"
}
