package graft.hb

import Ast._

/** Scala combinator DSL — the second authoring surface of the reference
  * (the F#-embedded `Hobbes.DSL`, tutorial/transformations.fsx:19-250;
  * production transformations in tools/workbench/src/production
  * transformations/). Statements built here are validated exactly like the
  * workbench validates: pretty-print to `.hb` and re-parse, failing fast
  * on any construction the parser would reject (Types.fs:143-157).
  *
  * {{{
  * import graft.hb.Dsl._
  * val t = transformation(
  *   only(c("WorkItemType") === s("User Story")),
  *   groupBy("Sprint", "Item").maxby(c("Changed")),
  *   pivot(c("Sprint"), c("State")).count(c("Item")),
  *   sortBy("Sprint"),
  *   create("m", moving(mean, 3, c("Done"))),
  *   slice("Sprint", "m"))
  * val df = t.run(sourceDf)
  * }}}
  */
object Dsl {

  // ------------------------------------------------------------- literals
  def c(name: String): Expr = ColRef(name)
  def s(v: String): Expr = StrLit(v)
  def n(v: Double): Expr = NumLit(v)
  val missing: Expr = MissingLit
  val keys: Expr = KeysExpr
  val ordinals: Expr = OrdinalsExpr
  val True: Expr = TrueLit

  // ----------------------------------------------------------- reductions
  val count: Reduction = Reduction.Count
  val distinct: Reduction = Reduction.Distinct
  val max: Reduction = Reduction.Max
  val mean: Reduction = Reduction.Mean
  val median: Reduction = Reduction.Median
  val min: Reduction = Reduction.Min
  val stddev: Reduction = Reduction.StdDev
  val sum: Reduction = Reduction.Sum
  val variance: Reduction = Reduction.Variance

  // ---------------------------------------------------------- expressions
  implicit final class ExprOps(private val l: Expr) extends AnyVal {
    def ===(r: Expr): Expr = Bin("=", l, r)
    def !==(r: Expr): Expr = Bin("!=", l, r)
    def >(r: Expr): Expr = Bin(">", l, r)
    def <(r: Expr): Expr = Bin("<", l, r)
    def >=(r: Expr): Expr = Bin(">=", l, r)
    def <=(r: Expr): Expr = Bin("<=", l, r)
    def +(r: Expr): Expr = Bin("+", l, r)
    def -(r: Expr): Expr = Bin("-", l, r)
    def *(r: Expr): Expr = Bin("*", l, r)
    def /(r: Expr): Expr = Bin("/", l, r)
    def &&(r: Expr): Expr = Bin("&&", l, r)
    def ||(r: Expr): Expr = Bin("||", l, r)
    def unary_! : Expr = Not(l)
    def isMissing: Expr = Bin("=", l, MissingLit)
    def isntMissing: Expr = Bin("!=", l, MissingLit)
  }

  def iff(cond: Expr)(t: Expr)(f: Expr): Expr = IfElse(cond, t, f)
  def int(e: Expr): Expr = IntCast(e)
  // text-analysis signal expressions (Ast.TextSig)
  def tokens(e: Expr): Expr = TextSig(TextSigKind.Tokens, e)
  def quality(e: Expr): Expr = TextSig(TextSigKind.Quality, e)
  def langid(e: Expr): Expr = TextSig(TextSigKind.LangId, e)
  def repetition(e: Expr): Expr = TextSig(TextSigKind.Repetition, e)
  def contains(e: Expr, vs: Expr*): Expr = Contains(e, vs)
  def regex(e: Expr, pattern: String, toks: RegexTok*): Expr =
    RegexExtract(e, pattern, if (toks.isEmpty) Seq(GroupTok(1)) else toks)
  def group(i: Int): RegexTok = GroupTok(i)
  def tok(s: String): RegexTok = LitTok(s)
  def formatDate(col: String, part: DatePart): Expr =
    FormatDate(ColRef(col), part)
  def moving(red: Reduction, window: Int, e: Expr): Expr =
    Moving(red, window, e)
  def expanding(red: Reduction, e: Expr): Expr = Expanding(red, e)
  def linReg(x: Expr, y: Expr): Expr = LinReg(x, y)

  // ----------------------------------------------------------- statements
  def create(name: String, e: Expr): Statement = CreateColumn(name, e)
  def rename(from: String, to: String): Statement = RenameColumn(from, to)
  def slice(names: String*): Statement = SliceColumns(names)
  def only(e: Expr): Statement = Only(e)
  val denseRows: Statement = DenseRows
  val denseColumns: Statement = DenseColumns
  val numericColumns: Statement = NumericColumns
  def indexBy(e: Expr): Statement = IndexBy(e)
  def sortBy(col: String): Statement = SortByColumn(col)
  def buckets(n: Int, red: Reduction): Statement = Buckets(n, red)
  def kmeans(n: Int, red: Reduction): Statement = KMeansCluster(n, red)
  def each(red: Reduction): Statement = Each(red)
  def extrapolate(name: String, known: Expr, nPredict: Int,
      nTrain: Int): Statement =
    LinearExtrapolation(name, known, nPredict, nTrain)

  // ---- training-pipeline extension statements (Ast.scala) ----------
  def dedupExact(col: String): Statement = DedupExact(col)
  def dedupMinhash(col: String, threshold: Double): Statement =
    DedupMinhash(col, threshold)
  def dedupSimhash(col: String, maxHamming: Int): Statement =
    DedupSimhash(col, maxHamming)
  def clusterMinhash(col: String, threshold: Double): Statement =
    ClusterMinhash(col, threshold)
  /** `split(by = "id", 80, 10, 10)` → `split 80/10/10 by id`. */
  def split(by: String, percents: Double*): Statement =
    SplitBy(percents, by)
  def splitSalted(by: String, salt: String, percents: Double*): Statement =
    SplitBy(percents, by, salt)
  def pack(tokensCol: String, budget: Long, shards: Int = 64): Statement =
    Pack(tokensCol, budget, shards)
  def sampleSalted(col: String, salt: String, pct: Double): Statement =
    SampleBy(pct, col, salt)
  def mixSalted(stratumCol: String, salt: String, defaultPct: Double,
      percents: (String, Double)*): Statement =
    MixBy(stratumCol, percents, defaultPct, salt)
  def chunk(textCol: String, window: Int, stride: Int): Statement =
    Chunk(textCol, window, stride)
  def chunk(textCol: String, window: Int): Statement =
    Chunk(textCol, window, window)
  def neighbors(k: Int, vec: Expr, pred: Expr): Statement =
    Neighbors(k, vec, pred)
  def neighbors(k: Int, vec: Expr, pred: Expr,
      index: AnnIndex): Statement =
    Neighbors(k, vec, pred, index)
  def scrub(textCol: String, k: Int = 8): Statement = Scrub(textCol, k)
  def encode(textCol: String, size: Int): Statement = Encode(textCol, size)
  def top(k: Int, by: String, per: String): Statement = TopBy(k, by, per)
  def topPct(pct: Int, by: String, per: String): Statement =
    TopFracBy(pct, by, per)
  def bpe(textCol: String, nMerges: Int): Statement = BpeEnc(textCol, nMerges)
  def wordpiece(textCol: String, nMerges: Int): Statement =
    WordPieceEnc(textCol, nMerges)
  def wordpieceUsing(textCol: String, conf: String,
      nMerges: Int): Statement = WordPieceUsing(textCol, conf, nMerges)
  def unigram(textCol: String, topMulti: Int): Statement =
    UnigramEnc(textCol, topMulti)
  def unigramUsing(textCol: String, conf: String,
      topMulti: Int): Statement = UnigramUsing(textCol, conf, topMulti)
  def deconUsing(textCol: String, conf: String, n: Int = 8): Statement =
    DeconUsing(textCol, conf, n)
  def bpeBytes(textCol: String, nMerges: Int): Statement =
    BpeBytesEnc(textCol, nMerges)
  def bpeBytesUsing(textCol: String, conf: String,
      nMerges: Int): Statement = BpeBytesUsing(textCol, conf, nMerges)
  def decodeBytes(encCol: String): Statement = BpeBytesDecode(encCol)
  def packBins(tokensCol: String, budget: Long,
      shards: Int = 64): Statement = PackBins(tokensCol, budget, shards)
  def pairs(textCol: String, scoreCol: String, groupCol: String,
      minMargin: Long = 1L): Statement =
    Pairs(textCol, scoreCol, groupCol, minMargin)
  def emitPacked(idsCol: String, budget: Long,
      shards: Int = 64): Statement = EmitPacked(idsCol, budget, shards)
  def emitAligned(idsCol: String, budget: Long,
      shards: Int = 64): Statement = EmitAligned(idsCol, budget, shards)
  def rebalanceSalted(stratumCol: String, salt: String,
      targets: (String, Double)*): Statement =
    RebalanceBy(stratumCol, targets, salt)
  def rebalanceWeighted(stratumCol: String, weightCol: String,
      salt: String, targets: (String, Double)*): Statement =
    RebalanceBy(stratumCol, targets, salt, Some(weightCol))
  def shuffle(salt: String = "epoch"): Statement = Shuffle(salt)
  def upsample(stratumCol: String, salt: String,
      factors: (String, Double)*): Statement =
    Upsample(stratumCol, factors, salt)
  def upsampleBudget(stratumCol: String, weightCol: String, budget: Long,
      salt: String, pcts: (String, Double)*): Statement =
    Upsample(stratumCol, pcts, salt, Some(weightCol -> budget))
  def shards(n: Int): Statement = Shards(n)
  def curriculum(scoreCol: String, bands: Int,
      salt: String = "curriculum"): Statement =
    Curriculum(scoreCol, bands, salt)
  def diverse(k: Int, vec: Expr): Statement = Diverse(k, vec)

  final case class GroupByBuilder(cols: Seq[String]) {
    def reduce(red: Reduction): Statement = GroupBy(cols, RowsBy(red))
    def maxby(e: Expr): Statement = GroupBy(cols, MaxBy(e))
    def minby(e: Expr): Statement = GroupBy(cols, MinBy(e))
  }
  def groupBy(cols: String*): GroupByBuilder = GroupByBuilder(cols)
  /** `window <ts> <minutes> [<delay>] group by <cols…> -> <red>`. */
  def windowAgg(tsCol: String, minutes: Int, cols: Seq[String],
      red: Reduction, delayMinutes: Int = 0): Statement =
    WindowAgg(tsCol, minutes, delayMinutes, cols, red)

  final case class PivotBuilder(rowE: Expr, colE: Expr,
      values: Seq[Expr] = Nil) {
    /** Declare the pivot columns up front — skips the distinct-discovery
      * job (the 100 TB path for high-cardinality colE). */
    def withValues(vs: Expr*): PivotBuilder = copy(values = vs)
    def agg(red: Reduction, valueE: Expr): Statement =
      Pivot(rowE, colE, red, valueE, values)
    def count(valueE: Expr): Statement = agg(Reduction.Count, valueE)
    def sum(valueE: Expr): Statement = agg(Reduction.Sum, valueE)
  }
  def pivot(rowE: Expr, colE: Expr): PivotBuilder = PivotBuilder(rowE, colE)

  // -------------------------------------------------------- transformation
  final case class Transformation(statements: Seq[Statement],
      series: Seq[String] = Nil) {
    /** Keyed-execution opt-in (the `series:` header of the text surface):
      * ordered windows partition by these per-entity columns wherever
      * they exist in the frame — the 100 TB path for raw-frame
      * moving/expanding/ordinals. */
    def withSeries(cols: String*): Transformation = copy(series = cols)
    /** `.hb` text of this transformation — includes the `series:` header
      * when the keyed opt-in is set, so text round-trips keep it. */
    def toHb: String = {
      val header =
        if (series.isEmpty) "" else s"series: ${series.mkString(" ")}\n\n"
      header + statements.map(Printer.print).mkString("\n")
    }
    def run(source: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Engine.run(Program(Header(Map(), Map(), Map()), statements), source,
        series)
  }

  /** Construct + validate: each statement must round-trip through the
    * parser, like the workbench's parse-at-construction rule. */
  def transformation(statements: Statement*): Transformation = {
    statements.foreach { st =>
      val printed = Printer.print(st)
      val reparsed = HbParser.parseStatement(printed)
      require(reparsed == st,
        s"statement does not round-trip: $st printed as '$printed' " +
          s"re-parsed as $reparsed")
    }
    Transformation(statements)
  }
}
