package graft

import org.apache.spark.sql.types._

/** Driver-gate CONTRACT lock (round-17 regression 215/218). The
  * driver hashes TYPED values and sorts result frames in pandas, so
  * two whole classes of registry entry fail its gate even when the
  * engine answer is bit-exact:
  *
  *  1. an oracle whose output type differs from the Spark output type
  *     — e.g. an un-cast DuckDB `sum(BIGINT)` is HUGEINT while Spark
  *     emits BIGINT, and HUGEINT≠BIGINT fails the typed hash (r17:
  *     q_psi, q_mann_kendall — the ONLY two of 217 oracles to do so);
  *  2. a registered Spark query emitting a nested column — pandas
  *     `sort_values` can't hash an ndarray cell, so the checker ERRs
  *     and the query gets NO gate at all (r17: q_pca_project's
  *     `array<double>`).
  *
  * This spec encodes both contracts registry-wide so the class can
  * never ship again:
  *  - every `SparkEntry.queries` entry's output schema (plan-only —
  *    no execution) must be flat scalars from the driver-hashable
  *    set (arrays/maps/structs/decimals/floats all out);
  *  - every `SparkEntry.oracleSql` entry, DESCRIBEd by the REAL
  *    DuckDB against the sf0.001 fixture views, must type-match the
  *    Spark side column-for-column under the BIGINT↔LongType /
  *    INTEGER↔IntegerType / DOUBLE↔DoubleType / VARCHAR↔StringType /
  *    BOOLEAN↔BooleanType / TIMESTAMP↔TimestampType / DATE↔DateType
  *    correspondence (the judge's r17 type scan, made a permanent
  *    two-sided gate). Runs through the driver-side python3+duckdb;
  *    cancels (visibly) where that oracle engine is absent.
  */
class OracleContractSpec extends SparkSpec {

  /** Spark scalar types the driver's typed hash and pandas sort both
    * ingest, with the DuckDB type each must pair with. Everything
    * else (arrays, maps, structs, decimals, int width surprises) has
    * bitten or would bite the gate.
    */
  private val sparkToDuck: Map[DataType, String] = Map(
    LongType -> "BIGINT", IntegerType -> "INTEGER",
    DoubleType -> "DOUBLE", StringType -> "VARCHAR",
    BooleanType -> "BOOLEAN", TimestampType -> "TIMESTAMP",
    DateType -> "DATE")

  // NOT plan-only (r18 ADVICE): most registrations resolve lazily,
  // but the eager ones run real work when fn() is invoked —
  // q_fdr_adjust localCheckpoints its six feeds, q_unigram_lm /
  // q_pca_project / q_unigram_segment / q_classifier_train execute
  // driver-collect training or model derivation, the indexed-ANN
  // queries build their index on first touch. Mitigations: the
  // SMALLEST fixture (sf0.001), and the lazy val memoizes the whole
  // pass so both tests pay it once.
  private lazy val sparkSchemas: Map[String, StructType] = {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).schema
    }
  }

  test("every registered query plans to flat driver-hashable scalar columns") {
    requireTestdata()
    val bad = sparkSchemas.toSeq.sortBy(_._1).flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if !sparkToDuck.contains(f.dataType) =>
          s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"driver-unhashable output columns (gate would fail or ERR):\n${bad.mkString("\n")}")
  }

  test("every oracle's DuckDB output types match the Spark output types column-for-column") {
    requireTestdata()
    val duckOk = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(duckOk, "driver-side python3+duckdb not present — oracle-type gate skipped")

    // Dump the oracle registry; DuckDB DESCRIBEs each query against
    // the fixture views (types only, nothing executes) and emits
    // name\tcolumn\ttype lines we compare in-JVM.
    val tmp = java.nio.file.Files.createTempDirectory("oracle-contract")
    val sqlJson = tmp.resolve("oracle_sql.json")
    val entries = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "").replace("\t", "\\t")
      s""""$k": "$esc""""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(sqlJson, entries)
    val script =
      """import sys, json, glob, os
        |import duckdb
        |con = duckdb.connect()
        |for p in glob.glob('/root/testdata/sf0.001/*.parquet'):
        |    name = os.path.basename(p)[:-8]
        |    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        |oracle = json.load(open(sys.argv[1]))
        |for name, sql in sorted(oracle.items()):
        |    try:
        |        desc = con.sql(f'DESCRIBE ({sql})').fetchall()
        |    except Exception as e:
        |        print(f'{name}\t__ERROR__\t{str(e)[:160]}'.replace(chr(10), ' '))
        |        continue
        |    for colname, coltype, *_ in desc:
        |        print(f'{name}\t{colname}\t{coltype}')
        |""".stripMargin
    val scriptPath = tmp.resolve("describe_oracles.py")
    java.nio.file.Files.writeString(scriptPath, script)
    val proc = new ProcessBuilder(
      "python3", scriptPath.toString, sqlJson.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    assert(code == 0, s"oracle DESCRIBE runner failed ($code):\n$out")

    val duckTypes: Map[String, Seq[(String, String)]] = out.linesIterator
      .filter(_.contains("\t")).toSeq
      .map { l => val p = l.split("\t", 3); (p(0), p(1), p(2)) }
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

    val problems = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { name =>
      duckTypes.getOrElse(name, Seq.empty) match {
        case cols if cols.exists(_._1 == "__ERROR__") =>
          Seq(s"$name: DESCRIBE-FAIL ${cols.find(_._1 == "__ERROR__").get._2}")
        case cols =>
          val duck = cols.toMap
          val sparkCols = sparkSchemas(name).fields
            .map(f => f.name -> f.dataType).toMap
          val missing = (sparkCols.keySet -- duck.keySet).toSeq.sorted
            .map(c => s"$name.$c: missing from oracle output")
          val extra = (duck.keySet -- sparkCols.keySet).toSeq.sorted
            .map(c => s"$name.$c: oracle-only column (${duck(c)})")
          val mismatched = sparkCols.toSeq.sortBy(_._1).flatMap {
            case (c, dt) => duck.get(c).collect {
              case dtype if sparkToDuck.get(dt) != Some(dtype) =>
                s"$name.$c: spark=${dt.sql} duckdb=$dtype"
            }
          }
          missing ++ extra ++ mismatched
      }
    }
    assert(problems.isEmpty,
      s"oracle/spark type contract violations (driver typed-hash would fail):\n${problems.mkString("\n")}")
  }
}
