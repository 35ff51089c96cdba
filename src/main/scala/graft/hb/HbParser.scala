package graft.hb

import Ast._
import scala.collection.mutable

/** Hand-rolled recursive-descent parser for `.hb` programs.
  *
  * The reference parses with FParsec inside the binary-only hobbes.core;
  * the grammar here is reconstructed from the seven corpus programs
  * (tests/transformations/ .hb corpus), the autocomplete snippets
  * (hobbes-autocomplete.code-snippets:3-213) and the TextMate grammar
  * (hobbes.YAML-tmLanguage:5-27). Statements are line-delimited; `!#…!#`
  * markdown blocks may span lines; the header is a small YAML subset
  * (scalar keys, `- item` lists, one nested `meta:` block).
  */
object HbParser {

  final case class ParseError(msg: String, line: Int)
      extends RuntimeException(s"line $line: $msg")

  private val statementStart = Set(
    "create", "rename", "slice", "only", "dense", "numeric", "index",
    "sort", "group", "pivot", "buckets", "k-means", "each",
    "dedup", "cluster", "split", "sample", "mix", "pack", "chunk",
    "neighbors", "scrub", "encode", "rebalance", "window", "top", "bpe",
    "shuffle", "shards", "upsample", "curriculum", "diverse", "score",
    "classify", "decode", "emit", "pairs", "wordpiece", "unigram",
    "decon", "fim", "sft", "fertility", "langid")

  def parse(text: String): Program = {
    val lines = text.split("\n", -1)
    var i = 0
    // ---- header ----
    val props = mutable.LinkedHashMap[String, String]()
    val lists = mutable.LinkedHashMap[String, Seq[String]]()
    val meta = mutable.LinkedHashMap[String, String]()
    var inMeta = false
    var pendingListKey: Option[String] = None
    def isStatementLine(l: String): Boolean = {
      val w = l.trim.takeWhile(c => !c.isWhitespace)
      statementStart.contains(w)
    }
    var headerDone = false
    while (i < lines.length && !headerDone) {
      val raw = lines(i)
      val l = raw.trim
      if (l.isEmpty) { i += 1 }
      else if (l.startsWith("!#") || isStatementLine(raw)) headerDone = true
      else if (l.startsWith("- ")) {
        pendingListKey match {
          case Some(k) => lists(k) = lists.getOrElse(k, Nil) :+ l.drop(2).trim
          case None => throw ParseError(s"list item without a key: $l", i + 1)
        }
        i += 1
      } else l.indexOf(':') match {
        case -1 => throw ParseError(s"bad header line: $l", i + 1)
        case ci =>
          val k = l.substring(0, ci).trim
          val v = l.substring(ci + 1).trim
          val indented = raw.startsWith(" ") || raw.startsWith("\t")
          if (k == "meta" && v.isEmpty) { inMeta = true; pendingListKey = None }
          else if (inMeta && indented) meta(k) = v
          else {
            inMeta = false
            if (v.isEmpty) pendingListKey = Some(k)
            else { props(k) = v; pendingListKey = None }
          }
          i += 1
      }
    }
    // ---- statements + comment blocks ----
    val stmts = mutable.ArrayBuffer[Statement]()
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.isEmpty) i += 1
      else if (l.startsWith("!#")) {
        val sb = new StringBuilder
        var rest = l.drop(2)
        var done = false
        while (!done) {
          val e = rest.indexOf("!#")
          if (e >= 0) { sb.append(rest.take(e)); done = true; i += 1 }
          else {
            sb.append(rest).append('\n')
            i += 1
            if (i >= lines.length)
              throw ParseError("unterminated !# comment block", i)
            rest = lines(i)
          }
        }
        stmts += Comment(sb.toString)
      } else {
        stmts += parseStatement(l, i + 1)
        i += 1
      }
    }
    Program(Header(props.toMap, lists.toMap, meta.toMap), stmts.toSeq)
  }

  // ---------------------------------------------------------------- lexer

  sealed trait Tok
  case class TIdent(s: String) extends Tok // bare identifier / keyword
  case class TQuoted(s: String) extends Tok // "double-quoted" → column name
  case class TStr(s: String) extends Tok // 'single-quoted' → string literal
  case class TNum(v: Double) extends Tok
  case class TRegex(pattern: String) extends Tok // /…/
  case class TGroup(n: Int) extends Tok // $1
  case class TSym(s: String) extends Tok // ( ) [ ] { } -> && || ! = …

  private def lex(s: String, lineNo: Int): Vector[Tok] = {
    val out = mutable.ArrayBuffer[Tok]()
    var p = 0
    def err(m: String) = throw ParseError(m, lineNo)
    while (p < s.length) {
      val c = s(p)
      if (c.isWhitespace) p += 1
      else if (c == '"' || c == '\'') {
        val q = c
        val sb = new StringBuilder
        p += 1
        while (p < s.length && s(p) != q) { sb.append(s(p)); p += 1 }
        if (p >= s.length) err(s"unterminated $q string")
        p += 1
        out += (if (q == '"') TQuoted(sb.toString) else TStr(sb.toString))
      } else if (c == '/' && {
        // a regex literal appears only right after `regex [e]`: previous
        // token is `]` AND some `regex` keyword is still awaiting its
        // pattern — counted, not last-index, so a regex NESTED inside
        // another's operand (`regex [regex [x] /a/ [$1]] /b/ [$1]`)
        // still gets its outer pattern. `(moving sum 3 [x] / r)` and a
        // division between two completed regexes stay division (counts
        // balanced).
        out.lastOption.contains(TSym("]")) &&
          out.count(_ == TIdent("regex")) >
            out.count(_.isInstanceOf[TRegex])
      }) {
        val sb = new StringBuilder
        p += 1
        while (p < s.length && s(p) != '/') {
          if (s(p) == '\\' && p + 1 < s.length) {
            // the .hb corpus double-escapes: `\\d` in file = `\d` regex
            s(p + 1) match {
              case '/' => sb.append('/')
              case '\\' => sb.append('\\')
              case other => sb.append('\\').append(other)
            }
            p += 2
          } else { sb.append(s(p)); p += 1 }
        }
        if (p >= s.length) err("unterminated /regex/")
        p += 1
        out += TRegex(sb.toString)
      } else if (c == '$' && p + 1 < s.length && s(p + 1).isDigit) {
        var q = p + 1
        while (q < s.length && s(q).isDigit) q += 1
        out += TGroup(s.substring(p + 1, q).toInt)
        p = q
      } else if (c.isDigit ||
        (c == '.' && p + 1 < s.length && s(p + 1).isDigit)) {
        var q = p
        while (q < s.length && (s(q).isDigit || s(q) == '.')) q += 1
        out += TNum(s.substring(p, q).toDouble)
        p = q
      } else if (c.isLetter || c == '_') {
        var q = p
        while (q < s.length &&
          (s(q).isLetterOrDigit || s(q) == '_' || s(q) == '-' ||
            s(q) == '.')) q += 1
        // `k-means` keeps its dash; a trailing dot is punctuation not name
        var word = s.substring(p, q)
        while (word.endsWith(".")) { word = word.dropRight(1); q -= 1 }
        out += TIdent(word)
        p = q
      } else {
        val two = if (p + 1 < s.length) s.substring(p, p + 2) else ""
        two match {
          case "->" | "&&" | "||" | ">=" | "<=" | "!=" =>
            out += TSym(two); p += 2
          case _ =>
            if ("()[]{}=><!+-*/%;,".indexOf(c) >= 0) {
              out += TSym(c.toString); p += 1
            } else err(s"unexpected character '$c'")
        }
      }
    }
    out.toVector
  }

  // ----------------------------------------------------- statement parser

  private final class P(toks: Vector[Tok], lineNo: Int) {
    var p = 0
    def err(m: String) =
      throw ParseError(s"$m (at token ${toks.drop(p).take(3)})", lineNo)
    def peek: Option[Tok] = toks.lift(p)
    def next(): Tok = { val t = toks.lift(p).getOrElse(err("unexpected end")); p += 1; t }
    def eat(sym: String): Unit = next() match {
      case TSym(`sym`) => ()
      case TIdent(`sym`) => ()
      case other => err(s"expected '$sym', got $other")
    }
    def atSym(s: String): Boolean = peek.contains(TSym(s))
    def atIdent(s: String): Boolean = peek.contains(TIdent(s))
    def ident(): String = next() match {
      case TIdent(s) => s
      case other => err(s"expected identifier, got $other")
    }
    /** Column name position: bare identifier or double-quoted. */
    def colName(): String = next() match {
      case TIdent(s) => s
      case TQuoted(s) => s
      case other => err(s"expected column name, got $other")
    }
    def int(): Int = next() match {
      case TNum(v) if v == v.toInt => v.toInt
      case other => err(s"expected integer, got $other")
    }
    def num(): Double = next() match {
      case TNum(v) => v
      case other => err(s"expected number, got $other")
    }
    def reduction(): Reduction = {
      val n = ident()
      Reduction.byName(n).getOrElse(err(s"unknown reduction '$n'"))
    }
    def done: Boolean = p >= toks.length

    // expression precedence: || < && < ! < cmp < addsub < muldiv < primary
    def expr(): Expr = orE()
    def orE(): Expr = {
      var l = andE()
      while (atSym("||")) { next(); l = Bin("||", l, andE()) }
      l
    }
    def andE(): Expr = {
      var l = notE()
      while (atSym("&&")) { next(); l = Bin("&&", l, notE()) }
      l
    }
    def notE(): Expr =
      if (atSym("!")) { next(); Not(notE()) } else cmpE()
    def cmpE(): Expr = {
      val l = addE()
      peek match {
        case Some(TSym(op @ ("=" | "!=" | ">" | "<" | ">=" | "<="))) =>
          next(); Bin(op, l, addE())
        case _ => l
      }
    }
    def addE(): Expr = {
      var l = mulE()
      while (atSym("+") || atSym("-")) {
        val op = next().asInstanceOf[TSym].s
        l = Bin(op, l, mulE())
      }
      l
    }
    def mulE(): Expr = {
      var l = primary()
      while (atSym("*") || atSym("/") || atSym("%")) {
        val op = next().asInstanceOf[TSym].s
        l = Bin(op, l, primary())
      }
      l
    }

    def bracketed(): Expr = { eat("["); val e = expr(); eat("]"); e }

    def primary(): Expr = peek match {
      case Some(TSym("(")) => next(); val e = expr(); eat(")"); e
      case Some(TSym("[")) => bracketed()
      case Some(TNum(v)) => next(); NumLit(v)
      case Some(TStr(v)) => next(); StrLit(v)
      case Some(TQuoted(v)) => next(); ColRef(v)
      case Some(TIdent(w)) => w match {
        case "missing" => next(); MissingLit
        case "keys" => next(); KeysExpr
        case "ordinals" => next(); OrdinalsExpr
        case "true" | "True" => next(); TrueLit
        case "int" => next(); eat("("); val e = expr(); eat(")"); IntCast(e)
        case "tokens" | "quality" | "langid" | "repetition" |
            "normalize" =>
          next(); eat("("); val e = expr(); eat(")")
          TextSig(TextSigKind.byName(w).get, e)
        case "if" =>
          next()
          val c = bracketed()
          eat("{"); val t = expr(); eat("}")
          eat("else"); eat("{"); val f = expr(); eat("}")
          IfElse(c, t, f)
        case "regex" =>
          next()
          val e = bracketed()
          val pat = next() match {
            case TRegex(r) => r
            case other => err(s"expected /regex/, got $other")
          }
          eat("[")
          val toks2 = mutable.ArrayBuffer[RegexTok]()
          while (!atSym("]")) next() match {
            case TGroup(n) => toks2 += GroupTok(n)
            case TStr(s) => toks2 += LitTok(s)
            case TIdent(s) => toks2 += LitTok(s)
            case other => err(s"bad regex token $other")
          }
          eat("]")
          RegexExtract(e, pat, toks2.toSeq)
        case "format" =>
          next(); eat("date")
          val e = ColRef(colName())
          val part = ident()
          FormatDate(e, DatePart.byName(part)
            .getOrElse(err(s"unknown date part '$part'")))
        case "moving" =>
          next()
          val red = reduction()
          val n = int()
          Moving(red, n, bracketed())
        case "expanding" =>
          next()
          val red = reduction()
          Expanding(red, bracketed())
        case "linear" =>
          next()
          ident() match {
            case "regression" => LinReg(bracketed(), bracketed())
            case "extrapolation" =>
              ExtrapExpr(bracketed(), int(), int())
            case other => err(s"unknown 'linear $other' in expression")
          }
        case "contains" =>
          next()
          val e = primary()
          eat("[")
          val vs = mutable.ArrayBuffer[Expr]()
          while (!atSym("]")) {
            if (atSym(";") || atSym(",")) next()
            else vs += (next() match {
              case TStr(s) => StrLit(s)
              case TNum(v) => NumLit(v)
              case other => err(s"bad contains value $other")
            })
          }
          eat("]")
          Contains(e, vs.toSeq)
        case _ => next(); ColRef(w)
      }
      case other => err(s"unexpected $other in expression")
    }
  }

  def parseExpr(s: String, lineNo: Int = 0): Expr = {
    val p = new P(lex(s, lineNo), lineNo)
    val e = p.expr()
    if (!p.done) p.err("trailing tokens after expression")
    e
  }

  /** Optional trailing `tags '<t1>' '<t2>' …` clause — shared by the
    * `bpe ids` / `wordpiece ids` / `unigram ids` families (and their
    * `using` twins): the listed strings become RESERVED special
    * tokens. */
  private def tagsClause(p: P): Seq[String] =
    if (p.atIdent("tags")) {
      p.eat("tags")
      val out = mutable.ArrayBuffer[String]()
      var more = true
      while (more) p.peek match {
        case Some(TStr(s)) => p.next(); out += s
        case _ => more = false
      }
      if (out.isEmpty)
        p.err("`tags` needs at least one quoted token")
      out.toSeq
    } else Nil

  def parseStatement(line: String, lineNo: Int = 0): Statement = {
    val p = new P(lex(line, lineNo), lineNo)
    val st = p.ident() match {
      case "create" =>
        p.eat("column")
        val name = p.colName()
        p.expr() match {
          // `linear extrapolation` appends rows → statement form
          case ExtrapExpr(known, nPred, nTrain) =>
            LinearExtrapolation(name, known, nPred, nTrain)
          case e => CreateColumn(name, e)
        }
      case "rename" =>
        p.eat("column"); RenameColumn(p.colName(), p.colName())
      case "slice" =>
        p.eat("columns")
        val names = mutable.ArrayBuffer[String]()
        while (!p.done) names += p.colName()
        SliceColumns(names.toSeq)
      case "only" => Only(p.expr())
      case "dense" => p.ident() match {
        case "rows" => DenseRows
        case "columns" => DenseColumns
        case other => p.err(s"expected rows|columns, got $other")
      }
      case "numeric" => p.eat("columns"); NumericColumns
      case "index" =>
        if (p.atIdent("rows")) p.next()
        p.eat("by"); IndexBy(p.expr())
      case "sort" =>
        p.eat("by")
        if (p.atIdent("column")) p.next()
        SortByColumn(p.colName())
      case "window" =>
        val ts = p.colName()
        val mins = p.int()
        val delay = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 0
        }
        p.eat("group"); p.eat("by")
        val wcols = mutable.ArrayBuffer[String]()
        while (!p.atSym("->")) wcols += p.colName()
        p.eat("->")
        WindowAgg(ts, mins, delay, wcols.toSeq, p.reduction())
      case "group" =>
        p.eat("by")
        val cols = mutable.ArrayBuffer[String]()
        while (!p.atSym("->")) cols += p.colName()
        p.eat("->")
        val red =
          if (p.atIdent("maxby")) { p.next(); MaxBy(p.expr()) }
          else if (p.atIdent("minby")) { p.next(); MinBy(p.expr()) }
          else RowsBy(p.reduction())
        GroupBy(cols.toSeq, red)
      case "pivot" =>
        val rowE = p.bracketed()
        val colE = p.bracketed()
        p.eat("->")
        val red = p.reduction()
        val valE = p.bracketed()
        // optional explicit column-value list, contains-style literals
        val values = mutable.ArrayBuffer[Expr]()
        if (p.atSym("[")) {
          p.next()
          while (!p.atSym("]")) {
            if (p.atSym(";") || p.atSym(",")) p.next()
            else values += (p.next() match {
              case TStr(s) => StrLit(s)
              case TNum(v) => NumLit(v)
              case other => p.err(s"bad pivot value $other")
            })
          }
          p.eat("]")
        }
        Pivot(rowE, colE, red, valE, values.toSeq)
      case "buckets" =>
        p.eat("("); val n = p.int(); p.eat(")")
        p.eat("->")
        p.eat("("); val r = p.reduction(); p.eat(")")
        Buckets(n, r)
      case "k-means" =>
        p.eat("("); val n = p.int(); p.eat(")")
        p.eat("->")
        p.eat("("); val r = p.reduction(); p.eat(")")
        KMeansCluster(n, r)
      case "each" => Each(p.reduction())
      // ---- training-pipeline extension statements (Ast.scala) ----
      case "dedup" => p.ident() match {
        case "exact" => DedupExact(p.colName())
        case "minhash" => DedupMinhash(p.colName(), p.num())
        case "simhash" => DedupSimhash(p.colName(), p.int())
        case "substrings" => DedupSubstrings(p.colName(), p.int())
        case other =>
          p.err(s"expected exact|minhash|simhash|substrings, got $other")
      }
      case "cluster" => p.ident() match {
        case "minhash" => ClusterMinhash(p.colName(), p.num())
        case other => p.err(s"expected minhash, got $other")
      }
      case "split" =>
        val pcts = mutable.ArrayBuffer[Double](p.num())
        while (p.atSym("/")) { p.next(); pcts += p.num() }
        p.eat("by")
        val c = p.colName()
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "split"
        }
        SplitBy(pcts.toSeq, c, salt)
      case "sample" =>
        val pct = p.num()
        p.eat("by")
        val c = p.colName()
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "sample"
        }
        SampleBy(pct, c, salt)
      case "mix" =>
        if (p.atIdent("temperature")) {
          p.eat("temperature")
          p.eat("by")
          val c = p.colName()
          val salt = p.peek match {
            case Some(TStr(s)) => p.next(); s
            case _ => "tmix"
          }
          TemperatureMixBy(c, salt)
        } else {
        p.eat("by")
        val c = p.colName()
        p.eat("[")
        val ps = mutable.ArrayBuffer[(String, Double)]()
        while (!p.atSym("]")) {
          if (p.atSym(";")) p.next()
          else { val s = p.colName(); ps += s -> p.num() }
        }
        p.eat("]")
        val dflt = p.num()
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "mix"
        }
        MixBy(c, ps.toSeq, dflt, salt)
        }
      case "emit" =>
        val aligned =
          if (p.atIdent("aligned")) { p.eat("aligned"); true }
          else { p.eat("packed"); false }
        val c = p.colName()
        val budget = p.int().toLong
        val shards = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 64
        }
        if (aligned) EmitAligned(c, budget, shards)
        else EmitPacked(c, budget, shards)
      case "pack" =>
        val bins = p.atIdent("bins")
        if (bins) p.eat("bins")
        val c = p.colName()
        val budget = p.int().toLong
        val shards = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 64
        }
        if (bins) PackBins(c, budget, shards) else Pack(c, budget, shards)
      case "pairs" =>
        val tc = p.colName()
        val sc = p.colName()
        p.eat("by")
        val gc = p.colName()
        val m = p.peek match {
          case Some(TNum(_)) => p.int().toLong
          case _ => 1L
        }
        Pairs(tc, sc, gc, m)
      case "chunk" =>
        val c = p.colName()
        val w = p.int()
        val stride = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => w
        }
        Chunk(c, w, stride)
      case "neighbors" =>
        val k = p.int()
        val vec = p.bracketed()
        val pred = p.bracketed()
        val mode = p.peek match {
          case Some(TIdent("pq")) => p.ident(); AnnIndex.Pq(p.int())
          case Some(TIdent("ivf")) => p.ident(); AnnIndex.Ivf(p.int())
          case Some(TIdent("mmr")) => p.ident(); AnnIndex.Mmr(p.int())
          case _ => AnnIndex.Exact
        }
        Neighbors(k, vec, pred, mode)
      case "encode" =>
        val c = p.colName()
        if (p.atIdent("using")) {
          p.eat("using")
          val conf = p.colName()
          EncodeUsing(c, conf, p.int())
        } else Encode(c, p.int())
      case "decode" =>
        if (p.atIdent("bytes")) {
          p.eat("bytes")
          BpeBytesDecode(p.colName())
        } else if (p.atIdent("ids")) {
          p.eat("ids")
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            val n = p.int()
            val tc = if (p.atIdent("of")) { p.eat("of"); p.colName() }
              else "text"
            BpeIdsDecodeUsing(c, conf, n, tc)
          } else BpeIdsDecode(c)
        } else {
          val c = p.colName()
          p.eat("using")
          val conf = p.colName()
          DecodeUsing(c, conf, p.int())
        }
      case "score" =>
        val c = p.colName()
        p.eat("using")
        val conf = p.colName()
        val b = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 4096
        }
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "lm"
        }
        ScoreUsing(c, conf, b, salt)
      case "classify" =>
        val c = p.colName()
        p.eat("using")
        val pos = p.colName()
        val neg = p.colName()
        val b = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 4096
        }
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "nb"
        }
        ClassifyUsing(c, pos, neg, b, salt)
      case "rebalance" =>
        p.eat("by")
        val c = p.colName()
        val w = p.peek match {
          case Some(TIdent("weight")) => p.ident(); Some(p.colName())
          case _ => None
        }
        p.eat("[")
        val ts = mutable.ArrayBuffer[(String, Double)]()
        while (!p.atSym("]")) {
          if (p.atSym(";")) p.next()
          else { val s = p.colName(); ts += s -> p.num() }
        }
        p.eat("]")
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "rebalance"
        }
        RebalanceBy(c, ts.toSeq, salt, w)
      case "shuffle" =>
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "epoch"
        }
        Shuffle(salt)
      case "shards" =>
        Shards(p.int())
      case "curriculum" =>
        p.eat("by")
        val c = p.colName()
        val bands = p.int()
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "curriculum"
        }
        Curriculum(c, bands, salt)
      case "upsample" =>
        p.eat("by")
        val c = p.colName()
        val w = p.peek match {
          case Some(TIdent("weight")) => p.ident(); Some(p.colName())
          case _ => None
        }
        p.eat("[")
        val fs = mutable.ArrayBuffer[(String, Double)]()
        while (!p.atSym("]")) {
          if (p.atSym(";")) p.next()
          else { val s = p.colName(); fs += s -> p.num() }
        }
        p.eat("]")
        val budget = p.peek match {
          case Some(TIdent("budget")) => p.ident(); Some(p.int().toLong)
          case _ => None
        }
        (w, budget) match {
          case (Some(wc), Some(b)) =>
            Upsample(c, fs.toSeq, p.peek match {
              case Some(TStr(s)) => p.next(); s
              case _ => "upsample"
            }, Some(wc -> b))
          case (None, None) =>
            Upsample(c, fs.toSeq, p.peek match {
              case Some(TStr(s)) => p.next(); s
              case _ => "upsample"
            })
          case _ => throw ParseError(
            "upsample: `weight <col>` and `budget <n>` go together " +
              "(the planned form) — give both or neither", lineNo)
        }
      case "diverse" =>
        val k = p.int()
        Diverse(k, p.bracketed())
      case "scrub" =>
        val c = p.colName()
        val k = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 8
        }
        Scrub(c, k)
      case "top" =>
        val k = p.int()
        val frac = p.peek match {
          case Some(TIdent("pct")) => p.ident(); true
          case _ => false
        }
        p.eat("by")
        val sc = p.colName()
        p.eat("per")
        val st = p.colName()
        if (frac) TopFracBy(k, sc, st) else TopBy(k, sc, st)
      case "bpe" =>
        if (p.atIdent("bytes")) {
          p.eat("bytes")
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            BpeBytesUsing(c, conf, p.int())
          } else BpeBytesEnc(c, p.int())
        } else if (p.atIdent("ids")) {
          p.eat("ids")
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            val n = p.int()
            BpeIdsUsing(c, conf, n, tagsClause(p))
          } else {
            val n = p.int()
            BpeIdsEnc(c, n, tagsClause(p))
          }
        } else {
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            BpeUsing(c, conf, p.int())
          } else BpeEnc(c, p.int())
        }
      case "sft" =>
        val pc = p.colName()
        val rc = p.colName()
        if (p.atIdent("using")) {
          p.eat("using")
          val conf = p.colName()
          SftUsing(pc, rc, conf, p.int())
        } else SftChat(pc, rc, p.int())
      case "fertility" =>
        val c = p.colName()
        p.eat("using")
        val conf = p.colName()
        FertilityUsing(c, conf, p.int())
      case "langid" =>
        val c = p.colName()
        p.eat("using")
        LangIdUsing(c, p.colName())
      case "fim" =>
        val c = p.colName()
        val pm = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 900
        }
        val salt = p.peek match {
          case Some(TStr(s)) => p.next(); s
          case _ => "fim"
        }
        FimTransform(c, pm, salt)
      case "decon" =>
        if (p.atIdent("semantic")) {
          p.eat("semantic")
          val c = p.colName()
          p.eat("using")
          val conf = p.colName()
          val thr = p.peek match {
            case Some(TNum(_)) => p.int().toLong
            case _ => 250000000L
          }
          SemDeconUsing(c, conf, thr)
        } else {
        val c = p.colName()
        p.eat("using")
        val conf = p.colName()
        val n = p.peek match {
          case Some(TNum(_)) => p.int()
          case _ => 8
        }
        DeconUsing(c, conf, n)
        }
      case "unigram" =>
        if (p.atIdent("ids")) {
          p.eat("ids")
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            val n = p.int()
            UnigramIdsUsing(c, conf, n, tagsClause(p))
          } else {
            val n = p.int()
            UnigramIdsEnc(c, n, tagsClause(p))
          }
        } else {
        val c = p.colName()
        if (p.atIdent("using")) {
          p.eat("using")
          val conf = p.colName()
          UnigramUsing(c, conf, p.int())
        } else UnigramEnc(c, p.int())
        }
      case "wordpiece" =>
        if (p.atIdent("ids")) {
          p.eat("ids")
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            val n = p.int()
            WordPieceIdsUsing(c, conf, n, tagsClause(p))
          } else {
            val n = p.int()
            WordPieceIdsEnc(c, n, tagsClause(p))
          }
        } else {
          val c = p.colName()
          if (p.atIdent("using")) {
            p.eat("using")
            val conf = p.colName()
            WordPieceUsing(c, conf, p.int())
          } else WordPieceEnc(c, p.int())
        }
      case other => p.err(s"unknown statement '$other'")
    }
    if (!p.done) p.err("trailing tokens after statement")
    st
  }
}
