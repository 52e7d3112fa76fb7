package graft.cdc

import graft.util.Json

/** Canal binlog JSON → normalized CDC op model (reference
  * cdc/CanalParser.scala:11-32: INSERT→insert, UPDATE→upsert,
  * DELETE→delete; DDL / heartbeat / null-data envelopes → None).
  *
  * Pure function usable both driver-side and inside a typed
  * `Dataset[String].flatMap` (SURVEY §2.8: the rebuild runs this as a
  * distributed typed transform rather than a driver loop).
  */
object CanalParser {

  private val opMap = Map(
    "INSERT" -> CdcOp.Insert,
    "UPDATE" -> CdcOp.Upsert,
    "DELETE" -> CdcOp.Delete)

  def parse(json: String): Option[CdcRecord] = {
    val env =
      try Json.read(json, classOf[CanalEnvelope])
      catch { case _: Exception => return None }
    if (env == null || env.isDdl || env.data == null || env.`type` == null) None
    else opMap.get(env.`type`).map { op =>
      CdcRecord(env.database, env.table, op, env.data.map(Json.write),
        env.ts, env.id)
    }
  }
}
