package graft.hb

import Ast._

/** AST → `.hb` text. Combined with HbParser this gives the same
  * validate-by-round-trip guarantee the reference's workbench applies to
  * its F# combinator DSL: every statement is string-ed and re-parsed at
  * construction (tools/workbench/src/Types.fs:143-157).
  */
object Printer {

  def print(p: Program): String = {
    val header = new StringBuilder
    p.header.props.foreach { case (k, v) => header.append(s"$k: $v\n") }
    p.header.lists.foreach { case (k, items) =>
      header.append(s"$k:\n")
      items.foreach(i => header.append(s"    - $i\n"))
    }
    if (p.header.meta.nonEmpty) {
      header.append("meta:\n")
      p.header.meta.foreach { case (k, v) => header.append(s"  $k: $v\n") }
    }
    val body = p.statements.map(print).mkString("\n")
    if (header.isEmpty) body else s"$header\n\n$body"
  }

  def print(st: Statement): String = st match {
    case CreateColumn(n, e) => s"create column ${name(n)} (${print(e)})"
    case RenameColumn(a, b) => s"rename column ${name(a)} ${name(b)}"
    case SliceColumns(ns) => s"slice columns ${ns.map(name).mkString(" ")}"
    case Only(e) => s"only (${print(e)})"
    case DenseRows => "dense rows"
    case DenseColumns => "dense columns"
    case NumericColumns => "numeric columns"
    case IndexBy(e) => s"index rows by ${print(e)}"
    case SortByColumn(n) => s"sort by column ${name(n)}"
    case GroupBy(cols, RowsBy(r)) =>
      s"group by ${cols.map(name).mkString(" ")} -> ${r.name}"
    case GroupBy(cols, MaxBy(e)) =>
      s"group by ${cols.map(name).mkString(" ")} -> maxby ${print(e)}"
    case GroupBy(cols, MinBy(e)) =>
      s"group by ${cols.map(name).mkString(" ")} -> minby ${print(e)}"
    case Pivot(r, c, red, v, vals) =>
      val tail =
        if (vals.isEmpty) "" else s" [${vals.map(print).mkString("; ")}]"
      s"pivot [${print(r)}] [${print(c)}] -> ${red.name} [${print(v)}]$tail"
    case Buckets(n, r) => s"buckets ($n) -> (${r.name})"
    case KMeansCluster(n, r) => s"k-means ($n) -> (${r.name})"
    case Each(r) => s"each ${r.name}"
    case LinearExtrapolation(n, known, p, t) =>
      s"create column ${name(n)} (linear extrapolation [${print(known)}] $p $t)"
    case DedupExact(c) => s"dedup exact ${name(c)}"
    case DedupSubstrings(c, k) => s"dedup substrings ${name(c)} $k"
    case DedupMinhash(c, th) => s"dedup minhash ${name(c)} ${num(th)}"
    case DedupSimhash(c, h) => s"dedup simhash ${name(c)} $h"
    case ClusterMinhash(c, th) => s"cluster minhash ${name(c)} ${num(th)}"
    case SplitBy(pcts, c, salt) =>
      val s = if (salt == "split") "" else s" '$salt'"
      s"split ${pcts.map(num).mkString("/")} by ${name(c)}$s"
    case SampleBy(pct, c, salt) =>
      val s = if (salt == "sample") "" else s" '$salt'"
      s"sample ${num(pct)} by ${name(c)}$s"
    case TemperatureMixBy(c, salt) =>
      val s = if (salt == "tmix") "" else s" '$salt'"
      s"mix temperature by ${name(c)}$s"
    case MixBy(c, ps, dflt, salt) =>
      val s = if (salt == "mix") "" else s" '$salt'"
      val pairs = ps.map { case (k, v) => s"${name(k)} ${num(v)}" }
        .mkString("; ")
      s"mix by ${name(c)} [$pairs] ${num(dflt)}$s"
    case Pack(c, budget, shards) =>
      val sh = if (shards == 64) "" else s" $shards"
      s"pack ${name(c)} $budget$sh"
    case PackBins(c, budget, shards) =>
      val sh = if (shards == 64) "" else s" $shards"
      s"pack bins ${name(c)} $budget$sh"
    case EmitPacked(c, budget, shards) =>
      val sh = if (shards == 64) "" else s" $shards"
      s"emit packed ${name(c)} $budget$sh"
    case EmitAligned(c, budget, shards) =>
      val sh = if (shards == 64) "" else s" $shards"
      s"emit aligned ${name(c)} $budget$sh"
    case Chunk(c, w, stride) =>
      val st = if (stride == w) "" else s" $stride"
      s"chunk ${name(c)} $w$st"
    case Pairs(tc, sc, gc, m) =>
      val mm = if (m == 1L) "" else s" $m"
      s"pairs ${name(tc)} ${name(sc)} by ${name(gc)}$mm"
    case WindowAgg(ts, mins, delay, cols, red) =>
      val d = if (delay == 0) "" else s" $delay"
      s"window ${name(ts)} $mins$d group by " +
        s"${cols.map(name).mkString(" ")} -> ${red.name}"
    case Neighbors(k, vec, pred, mode) =>
      val m = mode match {
        case AnnIndex.Exact => ""
        case AnnIndex.Pq(sub) => s" pq $sub"
        case AnnIndex.Ivf(n) => s" ivf $n"
        case AnnIndex.Mmr(lam) => s" mmr $lam"
      }
      s"neighbors $k [${print(vec)}] [${print(pred)}]$m"
    case Diverse(k, vec) =>
      s"diverse $k [${print(vec)}]"
    case Scrub(c, k) =>
      val kk = if (k == 8) "" else s" $k"
      s"scrub ${name(c)}$kk"
    case TopBy(k, sc, st) =>
      s"top $k by ${name(sc)} per ${name(st)}"
    case TopFracBy(p, sc, st) =>
      s"top $p pct by ${name(sc)} per ${name(st)}"
    case BpeEnc(c, n) =>
      s"bpe ${name(c)} $n"
    case WordPieceEnc(c, n) =>
      s"wordpiece ${name(c)} $n"
    case UnigramEnc(c, n) =>
      s"unigram ${name(c)} $n"
    case DeconUsing(c, conf, n) =>
      val nn = if (n == 8) "" else s" $n"
      s"decon ${name(c)} using ${name(conf)}$nn"
    case SemDeconUsing(c, conf, thr) =>
      val tt = if (thr == 250000000L) "" else s" $thr"
      s"decon semantic ${name(c)} using ${name(conf)}$tt"
    case FimTransform(c, pm, salt) =>
      val pp = if (pm == 900) "" else s" $pm"
      val ss = if (salt == "fim") "" else s" '$salt'"
      s"fim ${name(c)}$pp$ss"
    case UnigramUsing(c, conf, n) =>
      s"unigram ${name(c)} using ${name(conf)} $n"
    case WordPieceUsing(c, conf, n) =>
      s"wordpiece ${name(c)} using ${name(conf)} $n"
    case WordPieceIdsEnc(c, n, tags) =>
      s"wordpiece ids ${name(c)} $n" + tagsSuffix(tags)
    case WordPieceIdsUsing(c, conf, n, tags) =>
      s"wordpiece ids ${name(c)} using ${name(conf)} $n" + tagsSuffix(tags)
    case UnigramIdsEnc(c, n, tags) =>
      s"unigram ids ${name(c)} $n" + tagsSuffix(tags)
    case UnigramIdsUsing(c, conf, n, tags) =>
      s"unigram ids ${name(c)} using ${name(conf)} $n" + tagsSuffix(tags)
    case BpeIdsDecode(c) =>
      s"decode ids ${name(c)}"
    case BpeIdsDecodeUsing(c, conf, n, tc) =>
      s"decode ids ${name(c)} using ${name(conf)} $n" +
        (if (tc == "text") "" else s" of ${name(tc)}")
    case BpeBytesEnc(c, n) =>
      s"bpe bytes ${name(c)} $n"
    case BpeBytesDecode(c) =>
      s"decode bytes ${name(c)}"
    case BpeIdsEnc(c, n, tags) =>
      s"bpe ids ${name(c)} $n" + tagsSuffix(tags)
    case SftChat(pc, rc, n) =>
      s"sft ${name(pc)} ${name(rc)} $n"
    case SftUsing(pc, rc, conf, n) =>
      s"sft ${name(pc)} ${name(rc)} using ${name(conf)} $n"
    case FertilityUsing(c, conf, n) =>
      s"fertility ${name(c)} using ${name(conf)} $n"
    case LangIdUsing(c, conf) =>
      s"langid ${name(c)} using ${name(conf)}"
    case BpeIdsUsing(c, conf, n, tags) =>
      s"bpe ids ${name(c)} using ${name(conf)} $n" + tagsSuffix(tags)
    case Encode(c, n) =>
      s"encode ${name(c)} $n"
    case RebalanceBy(c, ts, salt, w) =>
      val s = if (salt == "rebalance") "" else s" '$salt'"
      val wc = w.map(x => s" weight ${name(x)}").getOrElse("")
      val pairs = ts.map { case (k, v) => s"${name(k)} ${num(v)}" }
        .mkString("; ")
      s"rebalance by ${name(c)}$wc [$pairs]$s"
    case Shuffle(salt) =>
      if (salt == "epoch") "shuffle" else s"shuffle '$salt'"
    case Shards(n) =>
      s"shards $n"
    case Curriculum(c, b, salt) =>
      val s = if (salt == "curriculum") "" else s" '$salt'"
      s"curriculum by ${name(c)} $b$s"
    case Upsample(c, fs, salt, plan) =>
      val s = if (salt == "upsample") "" else s" '$salt'"
      val pairs = fs.map { case (k, v) => s"${name(k)} ${num(v)}" }
        .mkString("; ")
      val wc = plan.map { case (w, _) => s" weight ${name(w)}" }
        .getOrElse("")
      val bb = plan.map { case (_, b) => s" budget $b" }.getOrElse("")
      s"upsample by ${name(c)}$wc [$pairs]$bb$s"
    case ScoreUsing(c, conf, b, salt) =>
      val bb = if (b == 4096) "" else s" $b"
      val ss = if (salt == "lm") "" else s" '$salt'"
      s"score ${name(c)} using ${name(conf)}$bb$ss"
    case ClassifyUsing(c, pos, neg, b, salt) =>
      val bb = if (b == 4096) "" else s" $b"
      val ss = if (salt == "nb") "" else s" '$salt'"
      s"classify ${name(c)} using ${name(pos)} ${name(neg)}$bb$ss"
    case EncodeUsing(c, conf, n) =>
      s"encode ${name(c)} using ${name(conf)} $n"
    case DecodeUsing(c, conf, n) =>
      s"decode ${name(c)} using ${name(conf)} $n"
    case BpeUsing(c, conf, n) =>
      s"bpe ${name(c)} using ${name(conf)} $n"
    case BpeBytesUsing(c, conf, n) =>
      s"bpe bytes ${name(c)} using ${name(conf)} $n"
    case Comment(text) => s"!#$text!#"
  }

  def print(e: Expr): String = e match {
    case ColRef(n) => name(n)
    case StrLit(v) => s"'$v'"
    case NumLit(v) => if (v == v.toLong) v.toLong.toString else v.toString
    case MissingLit => "missing"
    case KeysExpr => "keys"
    case OrdinalsExpr => "ordinals"
    case TrueLit => "true"
    case Bin(op, l, r) => s"(${print(l)} $op ${print(r)})"
    // fully parenthesized: `!` binds looser than comparison in the
    // grammar (`only !(x > 45)`, Velocity.hb:27), so a bare !(x) inside a
    // comparison would re-parse as !(x > …)
    case Not(x) => s"(!(${print(x)}))"
    case IfElse(c, t, f) =>
      s"if [${print(c)}] {${print(t)}} else {${print(f)}}"
    case IntCast(x) => s"int (${print(x)})"
    case TextSig(k, x) => s"${k.name} (${print(x)})"
    case Contains(x, vs) =>
      s"contains ${print(x)} [${vs.map(print).mkString("; ")}]"
    case RegexExtract(x, pat, toks) =>
      val p2 = pat.replace("\\", "\\\\").replace("/", "\\/")
      val ts = toks.map {
        case GroupTok(n) => s"$$$n"
        case LitTok(s) => s"'$s'"
      }.mkString(" ")
      s"regex [${print(x)}] /$p2/ [$ts]"
    case FormatDate(x, part) => x match {
      case ColRef(n) => s"format date ${name(n)} ${part.name}"
      case _ => s"format date ${print(x)} ${part.name}"
    }
    case Moving(r, n, x) => s"moving ${r.name} $n [${print(x)}]"
    case Expanding(r, x) => s"expanding ${r.name} [${print(x)}]"
    case LinReg(x, y) => s"linear regression [${print(x)}] [${print(y)}]"
    case other => throw new IllegalArgumentException(s"unprintable $other")
  }

  private def tagsSuffix(tags: Seq[String]): String =
    if (tags.isEmpty) ""
    else {
      // the lexer has no escape syntax inside 'single-quoted' strings,
      // so a tag containing a quote is UNPRINTABLE — refuse loudly
      // rather than emit text that breaks the print→parse round trip
      // every other statement upholds
      tags.find(_.contains('\'')).foreach(t =>
        throw new IllegalArgumentException(
          s"unprintable tag '$t': single quotes cannot appear in a " +
            "DSL tag (the lexer has no escape syntax)"))
      tags.map(t => s"'$t'").mkString(" tags ", " ", "")
    }

  private def num(v: Double): String =
    if (v == v.toLong) v.toLong.toString else v.toString

  /** Bare identifier when safe, double-quoted otherwise. */
  private def name(n: String): String = {
    val bareOk = n.nonEmpty && (n.head.isLetter || n.head == '_') &&
      n.forall(c => c.isLetterOrDigit || c == '_' || c == '.') &&
      !reserved.contains(n)
    if (bareOk) n else "\"" + n + "\""
  }

  private val reserved: Set[String] =
    Set("missing", "keys", "ordinals", "if", "else", "int", "regex",
      "format", "date", "moving", "expanding", "linear", "contains",
      "true", "only", "create", "rename", "slice", "column", "columns",
      "group", "by", "sort", "index", "rows", "dense", "numeric", "pivot",
      "buckets", "k-means", "each", "maxby", "minby",
      "dedup", "exact", "minhash", "simhash", "cluster", "split",
      "sample", "mix", "pack", "chunk", "neighbors", "scrub", "encode",
      "rebalance", "weight", "shuffle", "diverse",
      "tokens", "quality", "langid", "repetition") ++
      Reduction.all.map(_.name) ++ DatePart.all.map(_.name)
}
