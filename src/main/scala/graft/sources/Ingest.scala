package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion: hobbes "uniforming" — JSON flattening + type inference.
  *
  * The reference flattens nested JSON records to dotted column names and
  * arrays positionally (`col.0`, `col.1`, …), then re-parses every JSON
  * *string* as Double → DateTime → Int → String
  * (tools/visualizer/web/src/Server/Reader.fs:20-50, duplicated at
  * tools/visualizer/cli/src/ODataProvider.fs:32-41). Hobbes decides per
  * cell; a Spark column has one type, so the rule is applied per column:
  * a string column where every non-null/non-empty cell parses as X becomes
  * X (SURVEY §1.4), decided from one aggregate pass.
  */
object Ingest {

  /** TIMESTAMP(NANOS) parquet columns surface as longs under
    * spark.sql.legacy.parquet.nanosAsLong; rescale the conventional `ts`
    * column to a microsecond timestamp (`div 1000` floors — the same
    * truncation DuckDB's microsecond reader applies). A `ts` that
    * surfaces as TIMESTAMP_NTZ (parquet written without isAdjustedToUTC,
    * read with NTZ inference on) is cast to the instant type — with the
    * UTC session zone the wall-clock reading IS the instant. */
  def normalizeNanos(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Read a JSON-lines dataset (or array payload read by spark.read.json)
    * and uniform it. */
  def fromJson(spark: SparkSession, json: Seq[String]): DataFrame = {
    import spark.implicits._
    uniform(spark.read.json(json.toDS()))
  }

  def uniform(df: DataFrame): DataFrame = inferTypes(flatten(df))

  /** Recursive dotted-path flatten; arrays flattened positionally up to the
    * observed max length (Reader.fs:38-48). All array-length probes of a
    * pass are batched into ONE aggregate job — a wide nested payload costs
    * one scan per nesting level, not one per array column. */
  def flatten(df0: DataFrame): DataFrame = {
    var df = df0
    var changed = true
    while (changed) {
      changed = false
      val arrayCols = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] => f.name
      }.toSeq
      val maxLens: Map[String, Int] =
        if (arrayCols.isEmpty) Map.empty
        else {
          val probes = arrayCols.map(c => max(size(col(s"`$c`"))).as(c))
          val row = df.agg(probes.head, probes.tail: _*).head()
          arrayCols.zipWithIndex.map { case (c, i) =>
            c -> (if (row.isNullAt(i)) 0 else row.getInt(i))
          }.toMap
        }
      val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType =>
            changed = true
            st.fields.toSeq.map(sf =>
              col(s"`${f.name}`.`${sf.name}`").as(s"${f.name}.${sf.name}"))
          case _: ArrayType =>
            changed = true
            (0 until math.max(maxLens(f.name), 0)).map(i =>
              col(s"`${f.name}`").getItem(i).as(s"${f.name}.$i"))
          case _ => Seq(col(s"`${f.name}`"))
        }
      }
      if (changed) df = df.select(cols: _*)
    }
    df
  }

  private val intRe = "^-?\\d{1,9}$"
  private val doubleRe = "^-?\\d*\\.?\\d+([eE][-+]?\\d+)?$"
  // .NET DateTime.TryParse accepts both ISO and US-style strings — the
  // reference golden corpus uses "11/19/2020 07:41:51"
  // (tests/testdata.json; FIXTURES.md §1)
  private val usTsFmt = "MM/dd/yyyy HH:mm:ss"
  private def parseTs(x: Column): Column =
    coalesce(try_to_timestamp(x), try_to_timestamp(x, lit(usTsFmt)))

  /** Column-level Double → Timestamp → Int → String resolution for string
    * columns; JSON null ≙ "" (Reader.fs:49) is treated as missing. */
  def inferTypes(df: DataFrame): DataFrame = {
    val strCols = df.schema.fields.filter(_.dataType == StringType)
      .map(_.name).toSeq
    if (strCols.isEmpty) return df
    // one aggregate pass: per column, do all non-empty cells parse as
    // int / double / timestamp?
    def allParse(c: String, pred: Column => Column): Column =
      (count(when(col(s"`$c`").isNotNull && col(s"`$c`") =!= "" &&
        !pred(col(s"`$c`")), 1)) === 0) &&
        count(when(col(s"`$c`").isNotNull && col(s"`$c`") =!= "", 1)) > 0
    val checks = strCols.flatMap { c =>
      Seq(
        allParse(c, x => x.rlike(intRe)).as(s"$c##int"),
        allParse(c, x => x.rlike(doubleRe)).as(s"$c##double"),
        allParse(c, x => parseTs(x).isNotNull).as(s"$c##ts"))
    }
    val row = df.agg(checks.head, checks.tail: _*).head()
    val decided: Map[String, DataType] = strCols.zipWithIndex.map {
      case (c, i) =>
        val isInt = row.getBoolean(3 * i)
        val isDouble = row.getBoolean(3 * i + 1)
        val isTs = row.getBoolean(3 * i + 2)
        // reference order: Double first, then DateTime, then Int
        // (Reader.fs:25-34) — but an all-int column stays integral
        val t: DataType =
          if (isInt) LongType
          else if (isDouble) DoubleType
          else if (isTs) TimestampType
          else StringType
        c -> t
    }.toMap
    df.select(df.schema.fields.toSeq.map { f =>
      decided.get(f.name) match {
        case Some(StringType) | None => col(s"`${f.name}`")
        case Some(TimestampType) =>
          when(col(s"`${f.name}`") === "", lit(null))
            .otherwise(parseTs(col(s"`${f.name}`"))).as(f.name)
        case Some(t) =>
          when(col(s"`${f.name}`") === "", lit(null))
            .otherwise(col(s"`${f.name}`").cast(t)).as(f.name)
      }
    }: _*)
  }

  /** `localdata` provider — inline columns+rows literal
    * (workers/localdata.worker/src/Data.fs:11-49;
    * tools/workbench/src/Types.fs:105-127). */
  def localData(spark: SparkSession, columns: Seq[String],
      rows: Seq[Seq[Any]]): DataFrame = {
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq))
    val fields = columns.zipWithIndex.map { case (c, i) =>
      val t: DataType = rows.iterator.map(_(i)).collectFirst {
        case _: Int => LongType
        case _: Long => LongType
        case _: Double => DoubleType
        case _: Boolean => BooleanType
        case _: java.sql.Timestamp => TimestampType
        case _: String => StringType
      }.getOrElse(StringType)
      StructField(c, t, nullable = true)
    }
    val coerced = rows.map(r => Row.fromSeq(r.zip(fields).map {
      case (null, _) => null
      case (v: Int, f) if f.dataType == LongType => v.toLong
      case (v, _) => v
    }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(coerced), StructType(fields))
  }
}
