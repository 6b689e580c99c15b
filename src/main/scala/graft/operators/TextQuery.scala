package graft.operators

/** The Lucene query-string grammar CouchDB's `$text` accepts (the
  * Clouseau/Lucene `QueryParser` subset a Mango text index serves —
  * CouchDB "search" docs; the reference exposes the same strings via
  * `_find`'s `$text`): bare terms, `field:term`, quoted phrases
  * (`"a b"`, fielded too), `AND`/`OR`/`NOT` (and `&&`/`||`) with
  * parenthesized grouping, field-scoped groups (`title:(a OR b)`),
  * and inclusive/exclusive ranges (`price:[10 TO 20]`,
  * `price:{10 TO 20}`).
  *
  * Parsing is pure (no Spark): the AST here, the index-backed
  * execution in [[Mango.findText]] (postings probes for every
  * positive term/phrase + one residual predicate re-applied on the
  * fetched docs). One DELIBERATE, documented deviation: two adjacent
  * clauses conjoin (`quick fox` = `quick AND fox`) where Lucene's
  * default operator is OR — bare-term conjunction has been this
  * engine's `$text` semantics from the start (Mango.TextMatch), and
  * an explicit `OR` expresses the union. */
object TextQuery {

  sealed trait TQ
  /** One term; `field = None` queries the index's default field (the
    * stamped field set's concatenation). */
  final case class TTerm(field: Option[String], term: String) extends TQ
  /** A quoted phrase — terms must occur contiguously in order. */
  final case class TPhrase(field: Option[String],
                           terms: Seq[String]) extends TQ
  /** A fielded range: `[lo TO hi]` inclusive, `{lo TO hi}` exclusive
    * (per side, Lucene-style). Ranges always need a field — a
    * default-field range has no defined term order. */
  final case class TRange(field: String, lo: String, hi: String,
                          loInc: Boolean, hiInc: Boolean) extends TQ
  final case class TAnd(qs: Seq[TQ]) extends TQ
  final case class TOr(qs: Seq[TQ]) extends TQ
  final case class TNot(q: TQ) extends TQ

  /** Does the string use any syntax beyond bare whitespace terms?
    * (The routing test: plain conjunctive strings keep the original
    * exact-probe serve, including its index-only id-covered path.) */
  def isLucene(q: String): Boolean = {
    val metas = "():\"[]{}"
    q.exists(metas.contains(_)) ||
      q.split("\\s+").exists(w =>
        w == "AND" || w == "OR" || w == "NOT" || w == "&&" || w == "||")
  }

  // ----------------------------------------------------------- lexer

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class FieldT(name: String) extends Tok
  private final case class WordT(w: String) extends Tok
  private final case class PhraseT(s: String) extends Tok
  private final case class RangeT(lo: String, hi: String, loInc: Boolean,
                                  hiInc: Boolean) extends Tok

  private def bad(why: String): Nothing =
    throw new IllegalArgumentException(s"$$text query: $why")

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    def wordEnd(j0: Int): Int = {
      var j = j0
      while (j < n && !q(j).isWhitespace && !"():\"[]{}".contains(q(j)))
        j += 1
      j
    }
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val close = q.indexOf('"', i + 1)
        if (close < 0) bad(s"unterminated phrase at offset $i")
        out += PhraseT(q.substring(i + 1, close))
        i = close + 1
      } else if (c == '[' || c == '{') {
        // Lucene allows mixed brackets ({a TO b]) — each side's
        // bracket sets that side's inclusivity
        val ci = q.indexWhere(ch => ch == ']' || ch == '}', i + 1)
        if (ci < 0) bad(s"unterminated range at offset $i")
        val body = q.substring(i + 1, ci)
        val parts = body.split("(?i)\\sTO\\s")
        if (parts.length != 2) bad(s"range must be `lo TO hi`: [$body]")
        val (lo, hi) = (parts(0).trim, parts(1).trim)
        if (lo.isEmpty || hi.isEmpty) bad(s"range bound empty: [$body]")
        out += RangeT(lo, hi, loInc = c == '[', hiInc = q(ci) == ']')
        i = ci + 1
      } else {
        val j = wordEnd(i)
        if (j == i) bad(s"unexpected character '${q(i)}' at offset $i")
        val w = q.substring(i, j)
        i = j
        if (i < n && q(i) == ':') { out += FieldT(w); i += 1 }
        else w match {
          case "AND" | "&&" => out += AndT
          case "OR" | "||" => out += OrT
          case "NOT" => out += NotT
          case _ => out += WordT(w)
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------- parser

  /** Parse a Lucene-syntax query string to the AST. Throws
    * `IllegalArgumentException` with the offending construct on any
    * syntax error — never a silent partial parse. */
  def parse(q: String): TQ = {
    val toks = lex(q)
    if (toks.isEmpty) bad("empty query")
    val st = new State(toks)
    val tq = st.or()
    if (!st.atEnd) bad(s"trailing input after position ${st.pos}")
    tq
  }

  private final class State(toks: Vector[Tok]) {
    var pos = 0
    def atEnd: Boolean = pos >= toks.length
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      if (atEnd) bad("unexpected end of query")
      val t = toks(pos); pos += 1; t
    }

    def or(): TQ = {
      val parts = Vector.newBuilder[TQ]
      parts += and()
      while (peek.contains(OrT)) { next(); parts += and() }
      val ps = parts.result()
      if (ps.size == 1) ps.head else TOr(ps)
    }

    // adjacency = AND (see the object scaladoc); an explicit AND
    // token is equivalent
    def and(): TQ = {
      val parts = Vector.newBuilder[TQ]
      parts += unary()
      var more = true
      while (more) peek match {
        case Some(AndT) => next(); parts += unary()
        case Some(OrT) | Some(RP) | None => more = false
        case Some(_) => parts += unary()
      }
      val ps = parts.result()
      if (ps.size == 1) ps.head else TAnd(ps)
    }

    def unary(): TQ = peek match {
      case Some(NotT) => next(); TNot(unary())
      case _ => primary()
    }

    private def primary(): TQ = next() match {
      case LP =>
        val inner = or()
        if (!peek.contains(RP)) bad("missing ')'")
        next(); inner
      case WordT(w) => TTerm(None, w)
      case PhraseT(s) =>
        val ts = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (ts.isEmpty) bad("empty phrase")
        if (ts.size == 1) TTerm(None, ts.head) else TPhrase(None, ts)
      case RangeT(_, _, _, _) =>
        bad("a range needs a field: write field:[lo TO hi]")
      case FieldT(f) => fieldBody(f)
      case AndT | OrT => bad("AND/OR needs a clause on both sides")
      case RP => bad("unexpected ')'")
      case NotT => bad("NOT needs a clause") // unreachable via unary()
    }

    /** The clause a `field:` prefix scopes: a term, a phrase, a range,
      * or a parenthesized group whose terms/phrases all take the field
      * (`title:(a OR "b c")` — Lucene's field-scoped group). */
    private def fieldBody(f: String): TQ = {
      if (atEnd) bad(s"field '$f:' needs a value")
      next() match {
        case WordT(w) => TTerm(Some(f), w)
        case PhraseT(s) =>
          val ts = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
          if (ts.isEmpty) bad("empty phrase")
          if (ts.size == 1) TTerm(Some(f), ts.head)
          else TPhrase(Some(f), ts)
        case RangeT(lo, hi, loInc, hiInc) => TRange(f, lo, hi, loInc, hiInc)
        case LP =>
          val inner = or()
          if (!peek.contains(RP)) bad("missing ')'")
          next()
          scope(f, inner)
        case other => bad(s"field '$f:' cannot scope $other")
      }
    }

    /** Distribute a field over a group's terms and phrases. Nested
      * fields or ranges inside a field-scoped group are ambiguous in
      * Lucene and rejected here. */
    private def scope(f: String, tq: TQ): TQ = tq match {
      case TTerm(None, t) => TTerm(Some(f), t)
      case TPhrase(None, ts) => TPhrase(Some(f), ts)
      case TAnd(qs) => TAnd(qs.map(scope(f, _)))
      case TOr(qs) => TOr(qs.map(scope(f, _)))
      case TNot(x) => TNot(scope(f, x))
      case TTerm(Some(g), _) => bad(s"field '$g:' nested inside '$f:(...)'")
      case TPhrase(Some(g), _) =>
        bad(s"field '$g:' nested inside '$f:(...)'")
      case _: TRange => bad(s"range inside field group '$f:(...)'")
    }
  }
}
