package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** ScalaCheck properties for the ingest "uniforming" pass (the SURVEY §5
  * test plan's item 4): random dirty JSON → the documented column-level
  * Double → Timestamp → Int → String resolution and the dotted-path /
  * positional flatten (/root/reference/tools/visualizer/web/src/Server/
  * Reader.fs:25-48 semantics, applied per COLUMN as SURVEY §1.4
  * specifies).
  *
  * The model classifies each generated cell BY CONSTRUCTION (it came
  * from the int/double/timestamp/junk pool), so the expected column type
  * is pure Scala — no circular use of the code under test. One
  * deliberate assumption is pinned by the `canary` test: digit strings
  * and decimals do NOT parse as Spark timestamps, so an int+timestamp
  * mixture resolves to String (neither all-int, nor all-double, nor
  * all-timestamp).
  */
class IngestPropertySpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  // ---------------------------------------------------------- cell model

  sealed trait Kind
  case object KInt extends Kind
  case object KDbl extends Kind
  case object KTs extends Kind
  case object KJunk extends Kind
  case object KEmpty extends Kind

  /** raw string value + its by-construction classification; `utc` is the
    * epoch-milli meaning of a timestamp cell (session TZ is UTC). */
  final case class Cell(raw: String, kind: Kind, utc: Long = 0L)

  private val genInt: Gen[Cell] =
    Gen.chooseNum(-999999999L, 999999999L).map(v => Cell(v.toString, KInt))
  private val genDbl: Gen[Cell] = for {
    a <- Gen.chooseNum(-99999L, 99999L)
    f <- Gen.chooseNum(0, 9999)
    e <- Gen.oneOf("", "", "e2", "E-3") // mostly plain decimals
  } yield Cell(s"$a.$f$e", KDbl)
  private val genTs: Gen[Cell] = for {
    y <- Gen.chooseNum(1990, 2099); mo <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28); h <- Gen.chooseNum(0, 23)
    mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
    us <- Gen.oneOf(false, true) // ISO or the corpus's US format
  } yield {
    val iso = f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d"
    val raw = if (us) f"$mo%02d/$d%02d/$y%04d $h%02d:$mi%02d:$s%02d" else iso
    val utc = java.time.LocalDateTime
      .parse(iso.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    Cell(raw, KTs, utc)
  }
  private val genJunk: Gen[Cell] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(6, Gen.alphaChar)
  } yield Cell((h :: t).mkString, KJunk)
  private val genEmpty: Gen[Cell] = Gen.const(Cell("", KEmpty))

  private def pool(k: Kind): Gen[Cell] = k match {
    case KInt => genInt; case KDbl => genDbl; case KTs => genTs
    case KJunk => genJunk; case KEmpty => genEmpty
  }

  /** A column plan: mostly one kind, contaminated with another (and
    * empties) — the shapes that exercise the precedence order. */
  private val genColumn: Gen[List[Cell]] = for {
    n <- Gen.chooseNum(1, 7)
    primary <- Gen.oneOf[Kind](KInt, KDbl, KTs, KJunk)
    contaminant <- Gen.oneOf[Kind](KInt, KDbl, KTs, KJunk, KEmpty)
    cells <- Gen.listOfN(n,
      Gen.frequency(4 -> pool(primary), 1 -> pool(contaminant),
        1 -> genEmpty))
  } yield cells

  /** The documented resolution, from by-construction classifications:
    * all-int → Long; all int-or-double → Double; all timestamp →
    * Timestamp; anything else (or no non-empty cell) → String. */
  private def expectedType(cells: Seq[Cell]): DataType = {
    val ne = cells.filterNot(_.kind == KEmpty)
    if (ne.isEmpty) StringType
    else if (ne.forall(_.kind == KInt)) LongType
    else if (ne.forall(c => c.kind == KInt || c.kind == KDbl)) DoubleType
    else if (ne.forall(_.kind == KTs)) TimestampType
    else StringType
  }

  private def runColumns(cols: Seq[List[Cell]]): org.apache.spark.sql.DataFrame = {
    val nRows = cols.map(_.size).max
    val json = (0 until nRows).map { r =>
      val fields = cols.zipWithIndex.flatMap { case (cells, ci) =>
        cells.lift(r).map(c => s""""c$ci": "${c.raw}"""")
      }
      (s""""id": $r""" +: fields).mkString("{", ", ", "}")
    }
    Ingest.fromJson(spark, json)
  }

  private def seeds(n: Int)(body: Long => Unit): Unit =
    (1 to n).foreach(i => body(i.toLong))

  private val params = Gen.Parameters.default

  test("canary: digit/decimal strings are not Spark timestamps " +
    "(the int+ts mixture therefore resolves to String)") {
    val df = runColumns(Seq(List(
      Cell("442401", KInt), Cell("2020-11-19 07:41:51", KTs))))
    assert(df.schema("c0").dataType == StringType)
  }

  test("property: column-level Double→Timestamp→Int→String resolution " +
    "matches the by-construction model") {
    seeds(40) { i =>
      val gen = Gen.listOfN(3, genColumn)
      gen(params, org.scalacheck.rng.Seed(i)).foreach { cols =>
        val df = runColumns(cols)
        cols.zipWithIndex.foreach { case (cells, ci) =>
          val got = df.schema(s"c$ci").dataType
          assert(got == expectedType(cells),
            s"seed $i col c$ci cells=${cells.map(c => s"'${c.raw}'")} " +
              s"expected ${expectedType(cells)} got $got")
        }
      }
    }
  }

  test("property: converted cells carry the parsed value and the empty " +
    "string is missing (NULL) in every converted column") {
    seeds(30) { i =>
      val gen = Gen.listOfN(2, genColumn)
      gen(params, org.scalacheck.rng.Seed(i + 1000)).foreach { cols =>
        val df = runColumns(cols)
        val rows = df.orderBy("id").collect()
        cols.zipWithIndex.foreach { case (cells, ci) =>
          val name = s"c$ci"
          expectedType(cells) match {
            case LongType => cells.zipWithIndex.foreach { case (c, r) =>
              if (c.kind == KEmpty) assert(rows(r).isNullAt(rows(r).fieldIndex(name)))
              else assert(rows(r).getAs[Long](name) == c.raw.toLong)
            }
            case DoubleType => cells.zipWithIndex.foreach { case (c, r) =>
              if (c.kind == KEmpty) assert(rows(r).isNullAt(rows(r).fieldIndex(name)))
              else assert(rows(r).getAs[Double](name) == c.raw.toDouble)
            }
            case TimestampType => cells.zipWithIndex.foreach { case (c, r) =>
              if (c.kind == KEmpty) assert(rows(r).isNullAt(rows(r).fieldIndex(name)))
              else assert(
                rows(r).getAs[java.sql.Timestamp](name).getTime == c.utc,
                s"seed $i '${c.raw}'")
            }
            case _ => // String: untouched, including "" staying ""
              cells.zipWithIndex.foreach { case (c, r) =>
                assert(rows(r).getAs[String](name) == c.raw)
              }
          }
        }
      }
    }
  }

  // ------------------------------------------------------------- flatten

  sealed trait Shape
  case object SScalar extends Shape
  case object SArr extends Shape
  /** struct {a: scalar, b: ragged array} — exercises the multi-pass
    * recursion (struct → dotted, then nested array → positional). */
  case object SStructArr extends Shape

  /** Per-row value for one field, as (jsonLiteral, model). */
  private def genFieldRows(shape: Shape, nRows: Int)
      : Gen[List[(String, Any)]] = shape match {
    case SScalar =>
      Gen.listOfN(nRows, Gen.chooseNum(-999L, 999L))
        .map(_.map(v => (v.toString, v)))
    case SArr =>
      Gen.listOfN(nRows,
        Gen.chooseNum(0, 3).flatMap(len =>
          Gen.listOfN(len, Gen.chooseNum(-999L, 999L))))
        .map(_.map(a => (a.mkString("[", ",", "]"), a)))
    case SStructArr =>
      Gen.listOfN(nRows, for {
        a <- Gen.chooseNum(-999L, 999L)
        len <- Gen.chooseNum(0, 3)
        b <- Gen.listOfN(len, Gen.chooseNum(-999L, 999L))
      } yield (s"""{"a": $a, "b": ${b.mkString("[", ",", "]")}}""", (a, b)))
  }

  test("property: dotted-path / positional flatten matches the model " +
    "(arrays to observed max length, ragged tails NULL)") {
    seeds(30) { i =>
      val gen = for {
        nRows <- Gen.chooseNum(1, 5)
        shapes <- Gen.listOfN(2, Gen.oneOf[Shape](SScalar, SArr, SStructArr))
        fields <- Gen.sequence[List[List[(String, Any)]], List[(String, Any)]](
          shapes.map(genFieldRows(_, nRows)))
      } yield (nRows, shapes, fields)
      gen(params, org.scalacheck.rng.Seed(i + 2000)).foreach {
        case (nRows, shapes, fields) =>
          import spark.implicits._
          val json = (0 until nRows).map { r =>
            val fs = fields.zipWithIndex.map { case (rows, fi) =>
              s""""f$fi": ${rows(r)._1}"""
            }
            (s""""id": $r""" +: fs).mkString("{", ", ", "}")
          }
          val flat = Ingest.flatten(spark.read.json(json.toDS()))
          // expected columns from the model
          val expected = scala.collection.mutable.Map[String, Int => Any]()
          shapes.zipWithIndex.foreach { case (shape, fi) =>
            val rows = fields(fi)
            shape match {
              case SScalar =>
                expected(s"f$fi") = r => rows(r)._2
              case SArr =>
                val maxLen = rows.map(_._2.asInstanceOf[List[Long]].size).max
                (0 until maxLen).foreach { j =>
                  expected(s"f$fi.$j") =
                    r => rows(r)._2.asInstanceOf[List[Long]].lift(j).orNull
                }
              case SStructArr =>
                expected(s"f$fi.a") =
                  r => rows(r)._2.asInstanceOf[(Long, List[Long])]._1
                val maxLen = rows
                  .map(_._2.asInstanceOf[(Long, List[Long])]._2.size).max
                (0 until maxLen).foreach { j =>
                  expected(s"f$fi.b.$j") = r =>
                    rows(r)._2.asInstanceOf[(Long, List[Long])]._2
                      .lift(j).orNull
                }
            }
          }
          assert(flat.columns.toSet == expected.keySet.toSet + "id",
            s"seed $i shapes=$shapes")
          val got = flat.orderBy("id").collect()
          (0 until nRows).foreach { r =>
            expected.foreach { case (name, f) =>
              val idx = got(r).fieldIndex(name)
              f(r) match {
                case null => assert(got(r).isNullAt(idx),
                  s"seed $i $name row $r expected NULL")
                case v: Long => assert(!got(r).isNullAt(idx) &&
                  got(r).getLong(idx) == v,
                  s"seed $i $name row $r expected $v")
                case other => fail(s"unexpected model value $other")
              }
            }
          }
      }
    }
  }
}
