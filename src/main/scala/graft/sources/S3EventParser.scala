package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** S3 event-notification JSON → file URI list, the message decoder at
  * `/root/reference/spark-job/read.py:251-269`: every message body holds
  * `{"Records": [{"s3": {"bucket": {"name": b}, "object": {"key": k}}}]}`
  * and each record becomes `<protocol>://<bucket>/<key>`; all records of
  * all messages in a poll amalgamate into ONE batch (read.py:253-267).
  *
  * `protocol` follows the job config (`s3a` in the cloud, `file` locally —
  * for `file` the "bucket" is a root directory and the URI is
  * `file:///<bucket>/<key>`).
  */
object S3EventParser {

  def parseMessage(body: String, protocol: String): Seq[String] = {
    val root =
      try JsonMethods.parse(body)
      catch { case _: Throwable => return Nil }
    (root \ "Records") match {
      case JArray(records) =>
        records.flatMap { r =>
          val bucket = r \ "s3" \ "bucket" \ "name"
          val key = r \ "s3" \ "object" \ "key"
          (bucket, key) match {
            case (JString(b), JString(k)) => Some(uri(protocol, b, k))
            case _                        => None
          }
        }
      case _ => Nil
    }
  }

  def parseBatch(bodies: Seq[String], protocol: String): Seq[String] =
    bodies.flatMap(parseMessage(_, protocol))

  private def uri(protocol: String, bucket: String, key: String): String =
    protocol match {
      case "file" => s"file:///${bucket.stripPrefix("/")}/$key"
      case p      => s"$p://$bucket/$key"
    }

  /** Producer-side helper: the event JSON for a (bucket, key) — the shape
    * `create_sqs.sh` wires S3 to emit.
    */
  def eventJson(bucket: String, keys: Seq[String]): String = {
    val records = keys.map { k =>
      JObject("s3" -> JObject(
        "bucket" -> JObject("name" -> JString(bucket)),
        "object" -> JObject("key" -> JString(k))))
    }
    JsonMethods.compact(JsonMethods.render(
      JObject("Records" -> JArray(records.toList))))
  }
}
