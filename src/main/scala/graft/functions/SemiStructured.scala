package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured ingestion via Spark 4's VARIANT type — the open-format
  * answer to schemaless event payloads: parse once into the binary
  * variant encoding, then shred typed fields with `variant_get` path
  * extraction. Unlike `from_json`, no up-front schema is required and
  * unparsed structure is retained for later extraction; unlike raw
  * `get_json_object` string hacking, extraction is typed and
  * codegen-friendly on the compact binary form.
  *
  * Scale shape: `parse_json` + `try_variant_get` are pure map-side
  * expressions — a 100 TB payload column shreds in the scan stage with no
  * shuffle; the variant binary is columnar-compressible and prunable.
  */
object SemiStructured {

  /** One field to extract: output column name, variant path (e.g. `$.a.b`
    * or `$.items[0]`), and the Spark SQL type to cast to (e.g. "bigint",
    * "string", "double"). */
  final case class Field(name: String, path: String, dataType: String)

  /** Parse `jsonCol` (a JSON string column) and shred `fields` into typed
    * columns appended to the frame. Extraction is `try_variant_get`:
    * missing paths / type mismatches yield NULL, never an error — the
    * lenient semantics ingestion wants (pair with an expectations report
    * for strictness). Malformed JSON rows also surface as NULLs via
    * `try_parse_json`. */
  def shredJson(df: DataFrame, jsonCol: String, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "shredJson: no fields to extract")
    require(fields.map(_.name).distinct.size == fields.size,
      s"shredJson: duplicate output names in ${fields.map(_.name).mkString(", ")}")
    val parsed = df.withColumn("__graft_variant", try_parse_json(col(jsonCol)))
    fields
      .foldLeft(parsed) { (d, f) =>
        d.withColumn(f.name, try_variant_get(col("__graft_variant"), f.path, f.dataType))
      }
      .drop("__graft_variant")
  }

  /** Chat-template rendering: a JSON conversation (`[{"role": ...,
    * "content": ...}, ...]`) flattened to one training-text column plus
    * turn statistics — the fine-tuning-data preparation step between raw
    * conversation logs and sequence packing ([[graft.text.Sharding]]).
    * Rendering is `"<header>role:\ncontent"` per turn, newline-joined —
    * the minimal template shape; swap `header` per tokenizer convention.
    *
    * Pure column expressions (from_json + transform + concat), map-side at
    * scan speed. Malformed JSON → NULL messages → NULL rendered text and
    * zero turn counts (quarantine-friendly, never a crash). */
  def flattenChat(
      df: DataFrame,
      jsonCol: String,
      outCol: String = "chat_text",
      header: String = "### "): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val msgs = from_json(col(jsonCol), schema)
    df
      .withColumn("__graft_msgs", msgs)
      .withColumn(outCol,
        // concat_ws silently folds a NULL array to "" — guard explicitly so
        // malformed JSON stays NULL (quarantinable), distinct from an
        // empty-but-valid conversation
        when(col("__graft_msgs").isNull, lit(null).cast("string"))
          .otherwise(concat_ws("\n", transform(col("__graft_msgs"),
            // coalesce each field: a turn with a missing role/content must
            // still RENDER (else concat→NULL, concat_ws silently drops the
            // turn, and chat_text disagrees with n_turns)
            m => concat(lit(header), coalesce(m.getField("role"), lit("")),
              lit(":\n"), coalesce(m.getField("content"), lit("")))))))
      .withColumn("n_turns", coalesce(size(col("__graft_msgs")), lit(-1))
        .cast("long"))
      .withColumn("n_user_turns",
        coalesce(size(filter(col("__graft_msgs"), m => m.getField("role") === "user")), lit(-1))
          .cast("long"))
      .withColumn("n_turns", when(col("n_turns") < 0, 0L).otherwise(col("n_turns")))
      .withColumn("n_user_turns", when(col("n_user_turns") < 0, 0L).otherwise(col("n_user_turns")))
      .drop("__graft_msgs")
  }
}
