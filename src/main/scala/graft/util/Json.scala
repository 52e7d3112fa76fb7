package graft.util

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Minimal Jackson wrapper (jackson-module-scala ships with Spark).
  * Mirrors the reference's cdc/util/JsonUtil.scala:10-27 (Jackson Scala
  * mapper singleton) — used here for table metadata + commit files too.
  */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def write(value: Any): String = mapper.writeValueAsString(value)

  def read[T](s: String, clazz: Class[T]): T = mapper.readValue(s, clazz)

  /** Sample-JSON validation (reference util/Meta.scala:10-20 validates the
    * schema sample with a Gson round-trip before inferring from it).
    */
  def isValidObject(s: String): Boolean =
    try { val n = mapper.readTree(s); n != null && n.isObject }
    catch { case _: Exception => false }
}
