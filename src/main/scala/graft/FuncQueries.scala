package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Scalar-function surface queries F8-F21 (SURVEY.md §2.7): encodings,
  * crypto UDFs, JSON access/serialization, tagged-union flattening. */
object FuncQueries {

  val all: Vector[QueryDef] = Vector(

    // F8 — base58 encode UDF (utils.rs:3-5); Spark-only (no DuckDB base58)
    // oracle: base-256 → base-58 by two-limb long division in a recursive
    // CTE (the 16-byte digest exceeds signed HUGEINT, so the number is
    // carried as hi/lo 64-bit limbs: q_hi = hi div 58, and the partial
    // remainder r·2^64 + lo < 58·2^64 fits HUGEINT for the low step);
    // '1' per leading zero byte, exactly Base58.encode
    QueryDef("f8_base58",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          GraftFunctions.base58Encode(unhex(md5(col("c_name")))).as("b58"))
        .orderBy("c_custkey"),
      Some("""WITH RECURSIVE src AS (
             |  SELECT c_custkey, md5(c_name) AS hx FROM customer),
             |hexv AS (
             |  SELECT c_custkey, hx,
             |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
             |      [CAST(CASE WHEN unicode(hx[i:i]) >= 97 THEN unicode(hx[i:i]) - 87
             |                 ELSE unicode(hx[i:i]) - 48 END AS HUGEINT) FOR i IN range(1, 17)]),
             |      (a, c) -> a * 16 + c) AS hi,
             |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
             |      [CAST(CASE WHEN unicode(hx[i:i]) >= 97 THEN unicode(hx[i:i]) - 87
             |                 ELSE unicode(hx[i:i]) - 48 END AS HUGEINT) FOR i IN range(17, 33)]),
             |      (a, c) -> a * 16 + c) AS lo,
             |    (32 - len(ltrim(hx, '0'))) // 2 AS zero_bytes
             |  FROM src),
             |digs AS (
             |  SELECT c_custkey, hi, lo, '' AS s FROM hexv
             |  UNION ALL
             |  SELECT c_custkey, hi // 58,
             |    ((hi % 58) * 18446744073709551616 + lo) // 58,
             |    substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz',
             |      CAST(((hi % 58) * 18446744073709551616 + lo) % 58 AS INT) + 1, 1) || s
             |  FROM digs WHERE hi > 0 OR lo > 0),
             |f AS (SELECT c_custkey, s FROM digs WHERE hi = 0 AND lo = 0)
             |SELECT h.c_custkey, repeat('1', h.zero_bytes) || f.s AS b58
             |FROM hexv h JOIN f USING (c_custkey) ORDER BY c_custkey""".stripMargin)),

    // F9 — base64 with "base64:" prefix (utils.rs:7-15)
    QueryDef("f9_prefixed_base64",
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          GraftFunctions.prefixedBase64(col("p_name").cast("binary")).as("b64"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, 'base64:' || to_base64(encode(p_name)) AS b64
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // F10 — 0x-prefixed hex (models.rs:180-182)
    QueryDef("f10_prefixed_hex",
      (s, dir) => Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          GraftFunctions.prefixedHex(col("s_name").cast("binary")).as("hex"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, '0x' || lower(hex(encode(s_name))) AS hex
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // F11 — escape_unicode_null (utils.rs:22-24); corpus is NUL-free so the
    // transform is the identity here — the escaping itself is unit-tested
    QueryDef("f11_escape_null",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), GraftFunctions.escapeUnicodeNull(col("text")).as("escaped"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, text AS escaped FROM documents ORDER BY doc_id")),

    // F12 — blake2b/keccak Waves address (waves.rs:15-73); Spark-only.
    // Runs the NATIVE codegen expression (the conversion's production path);
    // UDF parity is asserted in PlansSpec.
    QueryDef("f12_waves_address",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          graft.plans.GraftExtensions.wavesAddress(unhex(md5(col("c_name"))), lit(87)).as("address"))
        .orderBy("c_custkey"),
      None),

    // F13 — extract_asset_id: empty bytes => WAVES (waves.rs:79-85); Spark-only
    // oracle: the 4-5-byte source strings fit one HUGEINT, so base58 is a
    // single-limb recursive-CTE division; empty bytes ⇒ the WAVES sentinel
    QueryDef("f13_extract_asset_id",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          GraftFunctions.extractAssetId(
            when(col("doc_id") % 10 === 0, lit(Array.emptyByteArray))
              .otherwise(col("source").cast("binary"))).as("asset_id"))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE b AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 THEN NULL
             |         ELSE list_reduce(list_prepend(CAST(0 AS HUGEINT),
             |                [CAST(unicode(source[i:i]) AS HUGEINT) FOR i IN range(1, len(source)+1)]),
             |              (a, c) -> a * 256 + c) END AS n
             |  FROM documents),
             |digs AS (
             |  SELECT doc_id, n, '' AS s FROM b WHERE n IS NOT NULL
             |  UNION ALL
             |  SELECT doc_id, n // 58,
             |    substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz',
             |      CAST(n % 58 AS INT) + 1, 1) || s
             |  FROM digs WHERE n > 0),
             |f AS (SELECT doc_id, s FROM digs WHERE n = 0)
             |SELECT b.doc_id, coalesce(f.s, 'WAVES') AS asset_id
             |FROM b LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // F14 — fragstring parse via regexp (mod.rs:548-581)
    QueryDef("f14_frag_parse",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("key", concat(col("source"), lit("__assetId2ticker__"), col("doc_id").cast("string")))
        .select(col("doc_id"), GraftFunctions.tickerKeyAssetId(col("key")).as("extracted"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_extract(source || '__assetId2ticker__' || CAST(doc_id AS VARCHAR),
             |    '^(.*?)__assetId2ticker__(.+)$', 2) AS extracted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // F15 — base58 validation (waves.rs:75-77): alphabet-only strings decode
    QueryDef("f15_base58_validate",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          GraftFunctions.base58IsValid(col("source")).as("is_valid"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, regexp_full_match(source, '[1-9A-HJ-NP-Za-km-z]+') AS is_valid
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // F16 — md5(script) (up.sql:658-660)
    QueryDef("f16_md5",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("content_md5"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(text) AS content_md5 FROM documents ORDER BY doc_id")),

    // F17 — to_tsvector approximation: sorted distinct lowercase tokens
    QueryDef("f17_tsvector_approx",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          array_join(array_sort(array_distinct(split(lower(trim(col("text"))), "\\s+"))), " ").as("tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  array_to_string(list_sort(list_distinct(string_split_regex(lower(trim(text)), '\s+'))), ' ') AS tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // F18 — jsonb ->> field access (up.sql:670-676)
    QueryDef("f18_json_field",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  json_extract_string(props, '$.missing') AS missing
             |FROM events ORDER BY event_id""".stripMargin)),

    // F19 — version-dependent Order JSON serialization (models.rs:101-192):
    // synthesize a typed order per event spanning versions 1-4 and run the
    // REAL serializer (graft.convert.OrderJson.serialize) over it; the
    // oracle rebuilds the same version-dependent field matrix with DuckDB's
    // to_json (compact, insertion-ordered, explicit nulls — byte-identical
    // format to Spark's). Covers: 14/15/17 field sets, WAVES→null asset
    // pair, null matcherFeeAssetId, eip712Signature nullability, priceMode
    // name mapping. The bytes→strings half (base58, 0x-hex, buy/sell,
    // signature=proofs[0]) is vector-tested in ConvertSpec.
    QueryDef("f19_order_json",
      (s, dir) => {
        val id = col("event_id")
        val ver = (lit(1) + id % 4).cast("int")
        val typed = struct(
          concat(lit("ord"), id.cast("string")).as("id"),
          ver.as("version"),
          concat(lit("addr"), col("user_id").cast("string")).as("sender"),
          concat(lit("pk"), col("user_id").cast("string")).as("senderPublicKey"),
          lit("MATCHER").as("matcherPublicKey"),
          struct(
            when(id % 3 =!= 0, concat(lit("ASSET"), (id % 5).cast("string"))).as("amountAsset"),
            when(id % 7 =!= 0, lit("USDT")).as("priceAsset")).as("assetPair"),
          when(id % 2 === 0, "buy").otherwise("sell").as("orderType"),
          (id * 17).as("amount"),
          (id * 13).as("price"),
          (id * 1000).as("timestamp"),
          (id * 1000 + 86400000L).as("expiration"),
          lit(300000L).as("matcherFee"),
          when(id % 11 =!= 0, lit("FEEASSET")).as("matcherFeeAssetId"),
          array(concat(lit("pf"), id.cast("string")), concat(lit("pg"), id.cast("string"))).as("proofs"),
          concat(lit("pf"), id.cast("string")).as("signature"),
          when(ver >= 4 && id % 2 === 0, concat(lit("0x"), id.cast("string"))).as("eip712Signature"),
          when(id % 3 === 1, "fixedDecimals").when(id % 3 === 2, "assetDecimals").as("priceMode"))
        Tables.events(s, dir)
          .select(id.as("event_id"), graft.convert.OrderJson.serialize(typed).as("order_json"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
             |  SELECT event_id, 1 + event_id % 4 AS version,
             |    'ord' || event_id AS oid, 'addr' || user_id AS sender, 'pk' || user_id AS spk,
             |    CASE WHEN event_id % 3 <> 0 THEN 'ASSET' || (event_id % 5) END AS aa,
             |    CASE WHEN event_id % 7 <> 0 THEN 'USDT' END AS pa,
             |    CASE WHEN event_id % 2 = 0 THEN 'buy' ELSE 'sell' END AS otype,
             |    event_id * 17 AS amount, event_id * 13 AS price,
             |    event_id * 1000 AS ots, event_id * 1000 + 86400000 AS oexp,
             |    CASE WHEN event_id % 11 <> 0 THEN 'FEEASSET' END AS mfai,
             |    'pf' || event_id AS p1, 'pg' || event_id AS p2,
             |    CASE WHEN 1 + event_id % 4 >= 4 AND event_id % 2 = 0 THEN '0x' || event_id END AS eip,
             |    CASE WHEN event_id % 3 = 1 THEN 'fixedDecimals'
             |         WHEN event_id % 3 = 2 THEN 'assetDecimals' END AS pm
             |  FROM events)
             |SELECT event_id,
             |  CASE
             |    WHEN version <= 2 THEN CAST(to_json({'id': oid, 'version': version,
             |      'sender': sender, 'senderPublicKey': spk, 'matcherPublicKey': 'MATCHER',
             |      'assetPair': {'amountAsset': aa, 'priceAsset': pa}, 'orderType': otype,
             |      'amount': amount, 'price': price, 'timestamp': ots, 'expiration': oexp,
             |      'matcherFee': 300000, 'proofs': [p1, p2], 'signature': p1}) AS VARCHAR)
             |    WHEN version = 3 THEN CAST(to_json({'id': oid, 'version': version,
             |      'sender': sender, 'senderPublicKey': spk, 'matcherPublicKey': 'MATCHER',
             |      'assetPair': {'amountAsset': aa, 'priceAsset': pa}, 'orderType': otype,
             |      'amount': amount, 'price': price, 'timestamp': ots, 'expiration': oexp,
             |      'matcherFee': 300000, 'proofs': [p1, p2], 'signature': p1,
             |      'matcherFeeAssetId': mfai}) AS VARCHAR)
             |    ELSE CAST(to_json({'id': oid, 'version': version,
             |      'sender': sender, 'senderPublicKey': spk, 'matcherPublicKey': 'MATCHER',
             |      'assetPair': {'amountAsset': aa, 'priceAsset': pa}, 'orderType': otype,
             |      'amount': amount, 'price': price, 'timestamp': ots, 'expiration': oexp,
             |      'matcherFee': 300000, 'proofs': [p1, p2], 'signature': p1,
             |      'matcherFeeAssetId': mfai, 'eip712Signature': eip, 'priceMode': pm}) AS VARCHAR)
             |  END AS order_json
             |FROM o ORDER BY event_id""".stripMargin)),

    // F20 — InvokeScript arg -> tagged union columns (convert.rs:171-198)
    QueryDef("f20_tagged_union",
      (s, dir) => {
        val t = col("event_type")
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(s, dir).select(
          col("event_id"),
          when(t === "click", "integer").when(t === "view", "boolean")
            .when(t === "error", "string").when(t === "signup", "binary")
            .otherwise("list").as("arg_type"),
          when(t === "click", k).as("arg_value_integer"),
          when(t === "view", col("value") > 100).as("arg_value_boolean"),
          when(t === "error", col("props")).as("arg_value_string"),
          when(t === "signup", concat(lit("base64:"), base64(t.cast("binary")))).as("arg_value_binary"),
          when(t === "purchase", concat(lit("["), k, lit("]"))).as("arg_value_list"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'click' THEN 'integer' WHEN 'view' THEN 'boolean'
             |    WHEN 'error' THEN 'string' WHEN 'signup' THEN 'binary' ELSE 'list' END AS arg_type,
             |  CASE WHEN event_type = 'click' THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS arg_value_integer,
             |  CASE WHEN event_type = 'view' THEN value > 100 END AS arg_value_boolean,
             |  CASE WHEN event_type = 'error' THEN props END AS arg_value_string,
             |  CASE WHEN event_type = 'signup' THEN 'base64:' || to_base64(encode(event_type)) END AS arg_value_binary,
             |  CASE WHEN event_type = 'purchase' THEN '[' || CAST(json_extract_string(props, '$.k') AS BIGINT) || ']' END AS arg_value_list
             |FROM events ORDER BY event_id""".stripMargin)),

    // F21 — DataEntry value -> typed columns (convert.rs:544-558)
    QueryDef("f21_data_entry",
      (s, dir) => {
        val l = col("lang")
        Tables.documents(s, dir).select(
          col("doc_id"),
          when(l.isin("en", "es"), "string").when(l === "zh", "integer").otherwise("binary").as("data_type"),
          when(l.isin("en", "es"), col("text")).as("data_value_string"),
          when(l === "zh", col("n_chars")).as("data_value_integer"),
          when(!l.isin("en", "es", "zh"), concat(lit("base64:"), base64(col("source").cast("binary")))).as("data_value_binary"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN lang IN ('en', 'es') THEN 'string' WHEN lang = 'zh' THEN 'integer' ELSE 'binary' END AS data_type,
             |  CASE WHEN lang IN ('en', 'es') THEN text END AS data_value_string,
             |  CASE WHEN lang = 'zh' THEN n_chars END AS data_value_integer,
             |  CASE WHEN lang NOT IN ('en', 'es', 'zh') THEN 'base64:' || to_base64(encode(source)) END AS data_value_binary
             |FROM documents ORDER BY doc_id""".stripMargin)))
}
