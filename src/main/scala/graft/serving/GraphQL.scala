package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** GraphQL query surface over the registered tables/views — the
  * reference's E3 Postgraphile layer (`docker-compose.yaml:46-72`:
  * Postgres views auto-exposed as GraphQL) re-expressed over Spark.
  *
  * Postgraphile generates, per view, a root field taking `condition`
  * (field equality), `first`/`offset`/`after` (pagination) and an
  * order; this implements exactly that shape over the session catalog:
  *
  * {{{
  * { Transfer_address_from_address_to_uint256_amount_d(
  *     condition: {contract_address: "0x…"}, first: 10,
  *     orderBy: "evt_block_number", desc: true)
  *   { from to amount evt_block_number } }
  * }}}
  *
  * Compilation target is ONE Spark SQL statement per root field —
  * selection list → projection (column pruning), condition → WHERE
  * (predicate pushdown into the parquet scan, since the views are
  * expression projections Catalyst inlines), first/offset/after →
  * LIMIT/OFFSET. The GraphQL layer adds no execution machinery of its
  * own, exactly like Postgraphile compiling to SQL for Postgres.
  *
  * Spec-depth boundary (a deliberate Postgraphile subset, stated here
  * so the edge is explicit):
  * - connections: `nodes`, `edges { cursor node }`, `pageInfo
  *   { hasNextPage hasPreviousPage startCursor endCursor }`,
  *   `totalCount`, and opaque `after` cursors (offset-encoded, the
  *   relay-connection contract for an offset-paginated backend);
  * - introspection (r10: the canonical graphql-js introspection
  *   query executes in full): `__schema { queryType mutationType
  *   subscriptionType types directives }` and `__type(name:)` over a
  *   built meta-model — per-view OBJECT types (columns + derived
  *   relation fields) with REAL type references (NON_NULL/LIST
  *   wrappers, walkable `ofType` chains), `<view>Connection` /
  *   `<view>Edge` / `PageInfo` shells, `<view>Condition`
  *   INPUT_OBJECTs with `inputFields`, `<view>OrderBy` ENUMs with
  *   `enumValues`, and per-field `args` (condition/first/offset/
  *   orderBy/desc/after with defaults) on every Query root and
  *   relation field — the Postgraphile meta-schema surface generated
  *   clients introspect. `orderBy:` accepts both the plain
  *   column-name string and the introspected `<COL>_ASC`/`<COL>_DESC`
  *   enum token (which carries its own direction; combining with
  *   `desc:` errors). mutationType/subscriptionType are null — the
  *   surface is read-only and subscriptions live on their own SSE
  *   endpoint;
  * - unions AND interfaces (r9): registered one-level abstract types
  *   over views ([[Unions]], [[Interfaces]]) — `__typename` +
  *   `... on <member>` selection sets with per-row dispatch,
  *   cross-member orderBy/condition over shared columns, compiled to
  *   ONE NULL-padded UNION ALL statement with a global ORDER BY +
  *   LIMIT. An interface additionally serves BARE fields from its
  *   derived member-schema intersection, introspects as kind
  *   INTERFACE with fields + possibleTypes, and its members list it
  *   under `interfaces`; `<view>Condition` INPUT_OBJECT types
  *   introspect with derived `inputFields` — the condition
  *   argument's shape for generated clients. (r10) union/interface
  *   orderBy and condition columns are TYPE-checked across members,
  *   not just existence-checked: a same-named column with different
  *   member types errors with the member-by-member listing instead
  *   of UNION-coercing the shared slot into lexicographic order;
  * - directives: `@skip(if:)` / `@include(if:)` on any selection,
  *   literal or `$variable` arguments; operation-header variable
  *   declarations with defaults are honored (values arrive via the
  *   standard JSON `variables` member) and their declared types are
  *   ENFORCED graphql-js-style (r11): missing NON_NULL errors "was
  *   not provided", explicit null into NON_NULL errors, scalar kinds
  *   (Int/Float/String/ID/Boolean) are checked, and a single value
  *   for a list type coerces to the one-element list (spec §6.1.2).
  *   A selection set EMPTIED by directives is valid
  *   GraphQL but has nothing to project — rejected with an explicit
  *   error (stated boundary);
  * - variables: usable anywhere a literal value sits, including
  *   whole `condition:` objects;
  * - fragments (r7): named definitions (`fragment F on T { … }`,
  *   before or after the operation, forward references fine) spread
  *   with `...F`, inline fragments `... on T { … }`, @skip/@include
  *   on spreads, fragments referencing fragments (cycles rejected).
  *   Type conditions DISPATCH (r8): every type here is concrete (one
  *   per view, plus Query/PageInfo), so spec rule 5.5.2.3 degenerates
  *   to equality — a condition naming the enclosing type
  *   (case-insensitively, Spark's own resolution convention) applies,
  *   any other can never apply and errors instead of silently
  *   applying as r7 did. Relation selections check against the
  *   relation's CHILD view; introspection subtrees are uncontexted
  *   and stay shape-checked;
  * - aliases (r7): `key: field` on root fields (query one view twice
  *   under different conditions), on columns (same column under two
  *   response keys — the SQL projection just repeats it), and on
  *   relation fields; (r8) also on columns INSIDE relation
  *   selections, while connection-shape keys (nodes/edges/node/
  *   cursor/pageInfo/totalCount and pageInfo's fields) reject an
  *   alias with a ParseError instead of silently dropping it;
  * - relations: one level of nesting through a [[Relation]] registry.
  *   Postgraphile derives these from foreign keys, which parquet
  *   tables don't carry; (r8) [[deriveRelations]] replaces the FK
  *   read with the key-column convention — declare each child's key
  *   once (`price` by `address`) and every catalog view carrying that
  *   key (or its decode alias `contract_<key>`) gets the relation
  *   field, no per-view enumeration; an explicit registry can still
  *   be merged over the derived one. Each selected relation compiles
  *   to ONE bounded child query for the whole page (key IN-list +
  *   per-parent row_number cap), never a query per parent row.
  *
  * Hand-rolled recursive-descent parser for the subset (no GraphQL
  * library in the dependency budget); identifiers are validated
  * against the actual view schema and values are rendered as escaped
  * SQL literals, so neither field names nor values can smuggle SQL.
  */
object GraphQL {

  /** A nested relation selection: `field(args) { cols }` inside a root
    * field's selection set, resolved against the [[Relation]] registry
    * at execution. */
  case class NestedQuery(
      field: String,
      condition: Seq[(String, Any)],
      first: Option[Long],
      orderBy: Option[String],
      desc: Boolean,
      selections: Seq[String],
      outputName: String = "",
      outputs: Seq[String] = Nil) {
    /** Response key for the relation (alias when one was given). */
    def outName: String = if (outputName.isEmpty) field else outputName
    /** Per-column response keys, parallel to `selections` — same
      * contract as [[FieldQuery.outs]] (a column may repeat under two
      * aliases; the projection stays positional). */
    def outs: Seq[String] = if (outputs.isEmpty) selections else outputs
  }

  case class FieldQuery(
      view: String,
      condition: Seq[(String, Any)],
      first: Option[Long],
      offset: Option[Long],
      orderBy: Option[String],
      desc: Boolean,
      selections: Seq[String],
      after: Option[String] = None,
      wantEdges: Boolean = false,
      pageInfo: Seq[String] = Nil,
      nested: Seq[NestedQuery] = Nil,
      outputName: String = "",
      outputs: Seq[String] = Nil) {
    /** Response key for the root field (alias when one was given) —
      * aliases are what let one document query the same view twice
      * under different conditions without the keys colliding. */
    def outName: String = if (outputName.isEmpty) view else outputName
    /** Per-column response keys, parallel to `selections` (which stays
      * the SQL projection — possibly with a column repeated under two
      * aliases; selecting a column twice is legal SQL). */
    def outs: Seq[String] = if (outputs.isEmpty) selections else outputs
  }

  /** One declared parent→child relation: selecting `fieldName` under
    * `parentView` joins `childView` on parentKey = childKey. */
  case class Relation(childView: String, parentKey: String, childKey: String)

  /** parentView → (relation field name → relation). */
  type Relations = Map[String, Map[String, Relation]]

  /** union root-field name → member view names (r9). A union is a
    * Postgraphile-style heterogeneous root field over registered
    * views: its selection sets take `__typename` and inline fragments
    * (`... on <member>`) ONLY — which member a row belongs to is a
    * runtime fact, rendered per row from the member tag. `orderBy`
    * and `condition` columns must exist on EVERY member (the
    * cross-member total order / filter is what makes a union more
    * than N separate queries). Compiles to ONE statement: per-member
    * branches (each keeping its own predicate pushdown and pruned
    * projection, NULL-padded into per-(member, column) slots so
    * same-named columns of different types can never collide) UNION
    * ALL'd under a global ORDER BY + LIMIT — Spark plans that as
    * TakeOrderedAndProject over the branch scans, never a full sort.
    * (r10) Relation fields ARE legal inside `... on <member>`
    * fragments: member-scoped, they resolve against that member's
    * relation registry, ride the parent key as a hidden per-member
    * slot, and run as ONE bounded child query per (member, relation)
    * for the whole page — rows of other members simply lack the
    * field, the fragment contract. Only a BARE relation field on an
    * interface stays a loud error (ambiguous across members under
    * one response key). */
  type Unions = Map[String, Seq[String]]

  /** interface root-field name → member view names (r9). Same
    * heterogeneous-feed machinery as [[Unions]], plus the GraphQL
    * interface contract: BARE fields are legal when every member
    * carries the column with one data type (the interface's field
    * set is DERIVED as the members' schema intersection — the
    * Postgraphile move, nothing declared by hand), rendered for
    * every row; `... on <member>` fragments narrow per row exactly
    * as in a union. Introspection reports kind INTERFACE with the
    * derived fields AND possibleTypes, and member object types list
    * the interfaces they implement. A bare field outside the
    * intersection (or with conflicting member types) errors with
    * the member-by-member explanation rather than silently nulling:
    * narrowing is what fragments are for. */
  type Interfaces = Map[String, Seq[String]]

  /** FK-style relation derivation — the Postgraphile move (it reads
    * foreign keys from the catalog; parquet tables carry none, so the
    * key-column CONVENTION is the declared schema): each `(child,
    * key)` pair contributes relation field `<child>s` (naive plural,
    * Postgraphile's default for unnamed FKs) to every OTHER registered
    * view whose schema carries `key` itself or the decode alias
    * `contract_<key>` — [[graft.operators.EventViews.project]] renames
    * the raw log's `address` to `contract_address` in every generated
    * view (`init.sql:53-207`'s views do the same), so the derivation
    * follows that rename for free. Children missing from the catalog
    * or missing their key column fail loudly. Merge explicit entries
    * OVER the result (`derived ++ manual`) when a hand-declared
    * relation should win. */
  def deriveRelations(spark: SparkSession,
      children: Seq[(String, String)]): Relations =
    children.foldLeft(Map.empty: Relations) { case (acc, (child, key)) =>
      val childCols =
        try spark.table(child).schema.fieldNames.toSet
        catch { case _: Exception =>
          throw ParseError(s"deriveRelations: child view '$child' is not registered") }
      if (!childCols(key))
        throw ParseError(s"deriveRelations: '$child' has no key column '$key'")
      val views = spark.catalog.listTables().collect().map(_.name)
      views.filterNot(_ == child).flatMap { parent =>
        // unresolvable catalog entries (e.g. a dropped-underneath or
        // database-qualified view) just don't derive — the child-side
        // checks above stay loud because those ARE the declaration
        val cols =
          try spark.table(parent).schema.fieldNames.toSet
          catch { case _: Exception => Set.empty[String] }
        val parentKey =
          if (cols(key)) Some(key)
          else if (cols(s"contract_$key")) Some(s"contract_$key")
          else None
        parentKey.map(pk => parent -> (s"${child}s" -> Relation(child, pk, key)))
      }.foldLeft(acc) { case (m, (p, r)) =>
        m + (p -> (m.getOrElse(p, Map.empty) + r))
      }
    }

  case class ParseError(msg: String) extends RuntimeException(msg)

  // ---- tokenizer -----------------------------------------------------

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Punct(c: Char) extends Tok
  private case object Spread extends Tok // "..."

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace || c == ',') i += 1
      else if (c == '#') { while (i < q.length && q(i) != '\n') i += 1 } // comment
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Ident(q.substring(start, i))
      } else if (c.isDigit || (c == '-' && i + 1 < q.length && q(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < q.length && (q(i).isDigit || q(i) == '.')) i += 1
        out += Num(q.substring(start, i))
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\') {
            if (i + 1 >= q.length) throw ParseError("unterminated escape")
            // the GraphQL spec escape set; anything else is an error, not
            // a silent pass-through (a verbatim copy would turn \n into
            // the letter n and match the wrong literal against the data)
            q(i + 1) match {
              case '"' => sb.append('"'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '/' => sb.append('/'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'u' =>
                if (i + 6 > q.length) throw ParseError("truncated \\u escape")
                val hex = q.substring(i + 2, i + 6)
                val cp =
                  try Integer.parseInt(hex, 16)
                  catch { case _: NumberFormatException =>
                    throw ParseError(s"invalid \\u escape '\\u$hex'") }
                sb.append(cp.toChar); i += 6
              case other => throw ParseError(s"unknown escape '\\$other'")
            }
          } else { sb.append(q(i)); i += 1 }
        }
        if (i >= q.length) throw ParseError("unterminated string")
        i += 1
        out += Str(sb.toString)
      } else if (c == '.') {
        if (i + 2 < q.length && q(i + 1) == '.' && q(i + 2) == '.') { out += Spread; i += 3 }
        else throw ParseError("unexpected character '.' (did you mean '...'?)")
      } else if ("{}():@$[]!=".contains(c)) { out += Punct(c); i += 1 }
      else throw ParseError(s"unexpected character '$c'")
    }
    out.toList
  }

  // ---- parser --------------------------------------------------------

  /** Generic selection-tree node; roots become [[FieldQuery]]s (or
    * introspection fields), nested levels become columns, connection
    * fields, or [[NestedQuery]]s. */
  /** Selection node. `alias` is the response key when present
    * (`alias: field`); `out` is the key to render under. A hand-rolled
    * companion keeps the 3-field `Sel(name, args, children)` extractor
    * every interpretation site matches on — alias is opt-in surface. */
  private final class Sel(val name: String, val args: Seq[(String, Any)],
      val children: Seq[Sel], val alias: Option[String],
      val onType: Option[String]) {
    def out: String = alias.getOrElse(name)
  }
  private object Sel {
    def apply(name: String, args: Seq[(String, Any)], children: Seq[Sel],
        alias: Option[String] = None, onType: Option[String] = None): Sel =
      new Sel(name, args, children, alias, onType)
    def unapply(s: Sel): Option[(String, Seq[(String, Any)], Seq[Sel])] =
      Some((s.name, s.args, s.children))
  }

  /** Split top-level `fragment Name on Type { … }` definitions out of
    * the token stream (GraphQL allows them before or after the
    * operation; spreads may forward-reference). Bodies keep their
    * braces and are re-parsed lazily at each spread site — that's
    * what lets fragments reference other fragments, with a visited-set
    * cycle guard. Depth tracking keeps a FIELD named "fragment"
    * (inside the operation's braces) from being misread. */
  private def splitFragments(
      toks: List[Tok]): (List[Tok], Map[String, (String, List[Tok])]) = {
    val frags = scala.collection.mutable.Map[String, (String, List[Tok])]()
    val op = scala.collection.mutable.ListBuffer[Tok]()
    var depth = 0
    var rest = toks
    while (rest.nonEmpty) rest match {
      case Ident("fragment") :: Ident(fname) :: Ident("on") :: Ident(tname) :: Punct('{') :: tail
          if depth == 0 =>
        var d = 1
        val body = scala.collection.mutable.ListBuffer[Tok](Punct('{'))
        var t = tail
        while (d > 0) t match {
          case (p @ Punct('{')) :: tt => d += 1; body += p; t = tt
          case (p @ Punct('}')) :: tt => d -= 1; body += p; t = tt
          case x :: tt => body += x; t = tt
          case Nil => throw ParseError(s"fragment $fname: unterminated body")
        }
        frags(fname) = (tname, body.toList)
        rest = t
      case (p @ Punct('{')) :: tail => depth += 1; op += p; rest = tail
      case (p @ Punct('}')) :: tail => depth -= 1; op += p; rest = tail
      case x :: tail => op += x; rest = tail
      case Nil => ()
    }
    (op.toList, frags.toMap)
  }

  private class Parser(var toks: List[Tok], provided: Map[String, Any] = Map.empty,
      frags: Map[String, (String, List[Tok])] = Map.empty,
      visited: Set[String] = Set.empty,
      // (enclosing type, field name) → the field's selection-set type,
      // None when unknown (introspection subtrees, relation-less
      // parses) — fragments in a None context stay shape-checked only
      childType: (Option[String], String) => Option[String] = (_, _) => None) {
    // operation variables: caller-provided values, plus declaration
    // defaults filled in by document()'s header pass
    private var vars: Map[String, Any] = provided
    // names declared in the operation header; None = headerless
    // operation (legacy dialect: variables usable straight from the
    // JSON member without declarations). When a header EXISTS, using
    // a name it didn't declare errors like graphql-js — a typo'd
    // `$varaible` must not silently resolve through a spare JSON
    // entry. (Unused-DECLARED-variable validation is deliberately
    // omitted: this schema has no list-typed argument positions, so
    // list variables would be unusable-by-construction under it.)
    private var declaredVars: Option[Set[String]] = None

    def expect(c: Char): Unit = toks match {
      case Punct(`c`) :: rest => toks = rest
      case t => throw ParseError(s"expected '$c', got $t")
    }
    def ident(): String = toks match {
      case Ident(s) :: rest => toks = rest; s
      case t => throw ParseError(s"expected identifier, got $t")
    }
    def peekIs(c: Char): Boolean = toks.headOption.contains(Punct(c))

    def value(): Any = toks match {
      case Str(s) :: rest => toks = rest; s
      case Num(s) :: rest =>
        toks = rest
        if (s.contains('.')) s.toDouble else s.toLong
      case Ident("true") :: rest => toks = rest; true
      case Ident("false") :: rest => toks = rest; false
      case Ident("null") :: rest => toks = rest; null
      // any other bare identifier is a GraphQL enum literal (r10:
      // the generated `<view>OrderBy` tokens); kept wrapped so
      // downstream can tell it from a quoted string
      case Ident(n) :: rest => toks = rest; EnumVal(n)
      case Punct('{') :: _ => objectArg()
      case Punct('$') :: Ident(n) :: rest =>
        toks = rest
        declaredVars.foreach(d => if (!d(n)) throw ParseError(
          s"""Variable "$$$n" is not defined by operation."""))
        if (!vars.contains(n)) throw ParseError(s"undefined variable $$$n")
        vars(n)
      case t => throw ParseError(s"expected value, got $t")
    }

    def objectArg(): Seq[(String, Any)] = {
      expect('{')
      val pairs = scala.collection.mutable.ListBuffer[(String, Any)]()
      while (!peekIs('}')) {
        val k = ident(); expect(':'); pairs += k -> value()
      }
      expect('}')
      pairs.toSeq
    }

    /** `@skip(if:)`/`@include(if:)` runs, evaluated in place (the
      * spec puts directives after arguments / the spread name, before
      * any selection set). Returns true when the annotated selection
      * must be dropped. */
    def directivesSkip(): Boolean = {
      var skipped = false
      while (peekIs('@')) {
        expect('@')
        val d = ident()
        val dargs = scala.collection.mutable.ListBuffer[(String, Any)]()
        if (peekIs('(')) {
          expect('(')
          while (!peekIs(')')) { val k = ident(); expect(':'); dargs += k -> value() }
          expect(')')
        }
        d match {
          case "skip" | "include" =>
            val cond = dargs.collectFirst { case ("if", b: Boolean) => b }
              .getOrElse(throw ParseError(s"@$d requires a Boolean if: argument"))
            if (if (d == "skip") cond else !cond) skipped = true
          case other => throw ParseError(s"unsupported directive @$other")
        }
      }
      skipped
    }

    /** `{ selections }`, spreads expanded, directives applied. A
      * selection set EMPTIED by directives is legal GraphQL (empty
      * objects) but not compilable to a projection — stated subset
      * boundary, rejected loudly rather than mis-served. The guard is
      * waived under `tolerateEmpty` (a skipped parent consumes its
      * braces without serving them). */
    def braceBlock(ctx: String, tolerateEmpty: Boolean = false,
        ctxType: Option[String] = None): Seq[Sel] = {
      expect('{')
      val out = scala.collection.mutable.ListBuffer[Sel]()
      var syntactic = 0
      while (!peekIs('}')) { syntactic += 1; out ++= selection(ctxType) }
      expect('}')
      if (syntactic > 0 && out.isEmpty && !tolerateEmpty)
        throw ParseError(
          s"$ctx: selection set empty after @skip/@include (unsupported: nothing to project)")
      out.toSeq
    }

    /** One selection-list entry: a field (possibly aliased), an
      * inline fragment, or a named-fragment spread — returns the
      * (possibly several, possibly zero) selections it contributes. */
    // every type here is CONCRETE (one per view, plus Query/PageInfo),
    // so spec rule 5.5.2.3 ("fragment spread is possible") degenerates
    // to equality: a condition naming the enclosing type applies, any
    // other can never apply and is a validation error — r7 shape-
    // checked the identifier and silently applied mismatches
    private def checkCondition(onType: String, ctxType: Option[String],
        what: String): Unit =
      ctxType.foreach { c =>
        if (!onType.equalsIgnoreCase(c)) throw ParseError(
          s"$what on '$onType' can never apply to type '$c'")
      }

    // a "union:<name>" context marks the selection sets of a UNION
    // root field (nodes / edges.node): fragments there are RETAINED
    // as member-tagged nodes (Sel.onType) instead of flattening —
    // which member a row belongs to is a runtime fact, so dispatch
    // happens per row at render time, not at parse time. Membership
    // is validated at interpretation, where the union registry lives;
    // the fragment BODY parses in the member's own type context, so
    // fragments nested inside it dispatch against the member.
    private def unionCtx(ctxType: Option[String]): Boolean =
      ctxType.exists(_.startsWith("union:"))

    def selection(ctxType: Option[String]): Seq[Sel] = toks match {
      case Spread :: rest =>
        toks = rest
        toks match {
          // inline fragment: `... on Type @dirs { … }`
          case Ident("on") :: Ident(onType) :: _ =>
            toks = toks.drop(2)
            val uni = unionCtx(ctxType)
            if (!uni) checkCondition(onType, ctxType, "inline fragment")
            val skipped = directivesSkip()
            val kids = braceBlock("inline fragment", tolerateEmpty = skipped,
              ctxType = if (uni) Some(onType) else ctxType)
            if (skipped) Nil
            else if (uni) Seq(Sel(onType, Nil, kids, onType = Some(onType)))
            else kids
          case Ident(fname) :: rest2 =>
            toks = rest2
            val skipped = directivesSkip()
            if (skipped) Nil
            else {
              if (visited(fname))
                throw ParseError(s"fragment cycle through '$fname'")
              val (onType, body) = frags.getOrElse(fname,
                throw ParseError(s"unknown fragment '$fname'"))
              val uni = unionCtx(ctxType)
              if (!uni) checkCondition(onType, ctxType, s"fragment '$fname'")
              // lazy re-parse of the stored body: same resolved vars
              // (defaults included), the visited set guards cycles
              val kids = new Parser(body, vars, frags, visited + fname, childType)
                .braceBlock(s"fragment $fname",
                  ctxType = if (uni) Some(onType) else ctxType)
              if (uni) Seq(Sel(onType, Nil, kids, onType = Some(onType)))
              else kids
            }
          case t => throw ParseError(s"expected fragment name or 'on', got $t")
        }
      case _ => sel(ctxType).toSeq
    }

    /** One field selection, directives applied: returns None when a
      * @skip/@include directive removes the field (its tokens —
      * including a nested selection set — are still consumed). */
    def sel(ctxType: Option[String]): Option[Sel] = {
      val first = ident()
      // `alias: field` — in a selection list a colon after the first
      // identifier can only be an alias (arguments live inside parens)
      val (alias, name) =
        if (peekIs(':')) { expect(':'); (Some(first), ident()) }
        else (None, first)
      val args = scala.collection.mutable.ListBuffer[(String, Any)]()
      if (peekIs('(')) {
        expect('(')
        while (!peekIs(')')) { val k = ident(); expect(':'); args += k -> value() }
        expect(')')
      }
      // directives sit between arguments and the selection set;
      // @skip/@include evaluate HERE, so nothing downstream ever sees
      // a skipped field
      val skipped = directivesSkip()
      val children =
        if (peekIs('{')) braceBlock(name, tolerateEmpty = skipped,
          ctxType = childType(ctxType, name))
        else Seq.empty
      if (skipped) None else Some(Sel(name, args.toSeq, children, alias))
    }

    /** `($x: Type = default, …)` header declarations, ENFORCED
      * graphql-js-style (r11; spec §6.1.2 "Coerce Variable Values"):
      * a missing value for a NON_NULL type without a default errors
      * ("was not provided"), an explicit null into NON_NULL errors,
      * scalar kinds are checked (Int/Float/String/ID/Boolean — the
      * served schema's scalar universe; named input-object/enum types
      * stay structural since the type universe is view-derived), and
      * a single non-list value supplied for a list type coerces to
      * the one-element list, exactly as graphql-js does. Defaults
      * fill `vars` for variables the caller didn't provide. */
    def varDefs(): Unit = {
      def typeRef(): VRef = {
        val base =
          if (peekIs('[')) { expect('['); val i = typeRef(); expect(']'); VList(i, nonNull = false) }
          else VNamed(ident(), nonNull = false)
        if (peekIs('!')) {
          expect('!')
          base match {
            case t: VNamed => t.copy(nonNull = true)
            case t: VList => t.copy(nonNull = true)
          }
        } else base
      }
      def isNonNull(t: VRef): Boolean = t match {
        case VNamed(_, nn) => nn
        case VList(_, nn) => nn
      }
      def describe(v: Any): String = v match {
        case null => "null"
        case s: String => "\"" + s + "\""
        case ListVal(items) => items.map(describe).mkString("[", ", ", "]")
        case _: Seq[_] => "{…}"
        case o => o.toString
      }
      // returns the (possibly list-coerced) value or throws ParseError
      def coerce(n: String, v: Any, t: VRef): Any = t match {
        case _ if v == null =>
          if (isNonNull(t)) throw ParseError(
            s"""Variable "$$$n" of non-null type "${t.render}" must not be null.""")
          else null
        case VList(inner, _) => v match {
          case ListVal(items) => ListVal(items.map(coerce(n, _, inner)))
          // spec list input coercion: a single value becomes [value]
          case single => ListVal(Seq(coerce(n, single, inner)))
        }
        case VNamed(name, _) =>
          // graphql-js coerces a whole JSON double (3.0) to the Int it
          // represents — downstream argument handling sees a Long
          val coerced = (name, v) match {
            case ("Int", d: Double) if d.isWhole => d.toLong
            case _ => v
          }
          val ok = name match {
            case "Int" => coerced.isInstanceOf[Long]
            case "Float" => v.isInstanceOf[Long] || v.isInstanceOf[Double]
            case "String" => v.isInstanceOf[String]
            case "ID" => v.isInstanceOf[String] || v.isInstanceOf[Long]
            case "Boolean" => v.isInstanceOf[Boolean]
            // view-derived named types: `<View>Condition` must be an
            // input object, `<View>OrderBy` an enum token (arrives as
            // a JSON string); anything else is schema-external and
            // stays unchecked
            case cond if cond.endsWith("Condition") =>
              v.isInstanceOf[Seq[_]] && !v.isInstanceOf[ListVal]
            case ob if ob.endsWith("OrderBy") =>
              v.isInstanceOf[String] || v.isInstanceOf[EnumVal]
            case _ => true
          }
          if (!ok) throw ParseError(
            s"""Variable "$$$n" got invalid value ${describe(v)}; """ +
              s"""expected type "$name".""")
          coerced
      }
      expect('(')
      val names = scala.collection.mutable.Set[String]()
      while (!peekIs(')')) {
        expect('$')
        val n = ident()
        names += n
        expect(':')
        val t = typeRef()
        if (peekIs('=')) {
          expect('=')
          val d = value()
          if (!vars.contains(n)) vars = vars + (n -> d)
        }
        if (vars.contains(n)) vars = vars + (n -> coerce(n, vars(n), t))
        else if (isNonNull(t)) throw ParseError(
          s"""Variable "$$$n" of required type "${t.render}" was not provided.""")
      }
      expect(')')
      declaredVars = Some(names.toSet)
    }

    def document(): Seq[Sel] = {
      // optional `query` / `subscription` (+ optional name, + optional
      // variable declarations) header — subscriptions share the
      // grammar; [[Subscriptions]] enforces the single-root-field rule
      toks match {
        case Ident("query" | "subscription") :: rest =>
          toks = rest
          toks match { case Ident(_) :: r2 => toks = r2; case _ => () }
          if (peekIs('(')) varDefs()
        case _ => ()
      }
      expect('{')
      val roots = scala.collection.mutable.ListBuffer[Sel]()
      var parsed = 0
      while (!peekIs('}')) { parsed += 1; roots ++= selection(Some("Query")) }
      expect('}')
      if (toks.nonEmpty) throw ParseError(s"trailing input: ${toks.head}")
      if (parsed == 0) throw ParseError("empty query")
      // roots may legitimately be empty after @skip/@include → {"data":{}}
      roots.toSeq
    }
  }

  /** Tokenize, split out fragment definitions, parse the operation.
    * `relations` feeds the type-context map fragments dispatch
    * against: root fields sit in `Query`, a view field's selections
    * (and its nodes/edges/node connection shells) in the view's own
    * type, `pageInfo` in `PageInfo`, a relation field's selections in
    * the relation's CHILD view. Introspection subtrees and unknown
    * fields get no context — fragments there stay shape-checked. */
  private def parseDocument(q: String, variables: Map[String, Any],
      relations: Relations = Map.empty, unions: Unions = Map.empty): Seq[Sel] = {
    val (opToks, frags) = splitFragments(tokenize(q))
    val childType: (Option[String], String) => Option[String] = {
      case (Some("Query"), f) =>
        if (f.startsWith("__")) None
        else unions.keys.find(_.equalsIgnoreCase(f)).map("union:" + _).orElse(Some(f))
      case (Some("PageInfo"), _) => None
      case (Some(v), f) =>
        if (f == "nodes" || f == "edges" || f == "node") Some(v)
        else if (f == "pageInfo") Some("PageInfo")
        else relations.collectFirst {
          case (k, m) if k.equalsIgnoreCase(v) => m
        }.getOrElse(Map.empty).get(f).map(_.childView)
      case _ => None
    }
    new Parser(opToks, variables, frags, childType = childType).document()
  }

  // ---- selection-tree interpretation ---------------------------------

  private val PageInfoFields =
    Seq("hasNextPage", "hasPreviousPage", "startCursor", "endCursor")

  /** A bare-identifier GraphQL enum literal as parsed by `value()` —
    * distinct from a quoted string so argument interpretation can
    * treat `orderBy: BLOCK_NUMBER_DESC` (the introspected
    * `<view>OrderBy` token) differently from `orderBy: "block_number"`
    * (the plain column-name dialect). */
  private case class EnumVal(name: String) {
    override def toString: String = name
  }

  /** A JSON-array variable value. Wrapped (not a bare Seq) so list
    * values can never be confused with the `Seq[(String, Any)]`
    * shape input OBJECTS use; any argument position that doesn't
    * understand lists errors naturally instead of misreading one. */
  private case class ListVal(items: Seq[Any])

  /** Declared VARIABLE type reference (`Int`, `[String!]!`, …) for
    * r11's graphql-js-style variable validation — distinct from the
    * introspection `TRef` family below, which models the meta-schema
    * wrapper chain. */
  private sealed trait VRef { def render: String }
  private case class VNamed(name: String, nonNull: Boolean) extends VRef {
    def render: String = name + (if (nonNull) "!" else "")
  }
  private case class VList(inner: VRef, nonNull: Boolean) extends VRef {
    def render: String = s"[${inner.render}]" + (if (nonNull) "!" else "")
  }

  private def argStr(args: Seq[(String, Any)], name: String): Option[String] =
    args.collectFirst { case (`name`, v) => v match {
      case s: String => s
      case o => throw ParseError(s"$name: expected string, got $o") } }

  private val OrderByToken = "^([A-Za-z0-9_]+)_(ASC|DESC)$".r

  /** The `orderBy:` argument in both dialects: a quoted string is a
    * plain column name (direction from `desc:`), a bare enum literal
    * — or a string that matches the all-caps token shape, which is
    * how a generated client's enum value arrives through the JSON
    * `variables` member — is a `<view>OrderBy` token `<COL>_ASC` /
    * `<COL>_DESC` carrying its own direction. Returns
    * (column, Some(desc)) for tokens, (column, None) for plain names.
    * A token combined with an explicit `desc:` argument is ambiguous
    * and rejected loudly. Token columns lower-case back to the
    * column name (the generator upper-cases; view columns are
    * lower-case by convention — a column that is itself all-caps
    * with an _ASC suffix would be ambiguous and is outside the
    * dialect). */
  private def orderByArg(args: Seq[(String, Any)]): (Option[String], Option[Boolean]) = {
    def fromToken(col: String, dir: String): (Option[String], Option[Boolean]) = {
      if (args.exists(_._1 == "desc")) throw ParseError(
        s"orderBy: ${col}_$dir already carries a direction; combining it " +
          "with desc: is ambiguous — drop one")
      (Some(col.toLowerCase), Some(dir == "DESC"))
    }
    args.collectFirst { case ("orderBy", v) => v }.map {
      case EnumVal(OrderByToken(col, dir)) => fromToken(col, dir)
      case EnumVal(o) => throw ParseError(
        s"orderBy: '$o' is not an OrderBy value (expected <COLUMN>_ASC or <COLUMN>_DESC)")
      case s: String => s match {
        case OrderByToken(col, dir) if s.toUpperCase == s => fromToken(col, dir)
        case _ => (Some(s), None)
      }
      case o => throw ParseError(s"orderBy: expected a column name or OrderBy enum value, got $o")
    }.getOrElse((None, None))
  }

  /** orderBy + desc resolution shared by root, union, and relation
    * fields: the enum token's direction wins (the conflict case threw
    * in [[orderByArg]]), else the `desc:` argument, else false. */
  private def orderAndDesc(args: Seq[(String, Any)]): (Option[String], Boolean) = {
    val (orderBy, tokenDesc) = orderByArg(args)
    (orderBy, tokenDesc.getOrElse(argBool(args, "desc")))
  }

  private def argLong(args: Seq[(String, Any)], name: String): Option[Long] =
    args.collectFirst { case (`name`, v) => v match {
      case l: Long => l
      case o => throw ParseError(s"$name: expected int, got $o") } }

  private def argBool(args: Seq[(String, Any)], name: String): Boolean =
    args.collectFirst { case (`name`, v) => v match {
      case b: Boolean => b
      case o => throw ParseError(s"$name: expected boolean, got $o") } }.getOrElse(false)

  private def argCondition(args: Seq[(String, Any)]): Seq[(String, Any)] =
    args.collectFirst { case ("condition", v) => v match {
      case s: Seq[_] => s.asInstanceOf[Seq[(String, Any)]]
      case o => throw ParseError(s"condition: expected object, got $o") } }
      .getOrElse(Seq.empty)

  private def checkArgNames(s: Sel, allowed: Set[String]): Unit =
    s.args.foreach { case (k, _) =>
      if (!allowed(k)) throw ParseError(s"${s.name}: unknown argument '$k'") }

  private def toNested(s: Sel): NestedQuery = {
    checkArgNames(s, Set("condition", "first", "orderBy", "desc"))
    // (column, response key) pairs — r7 kept only names here, so an
    // alias inside a relation was silently rendered under the COLUMN
    // name; keys now thread through exactly like FieldQuery.outs
    val pairs = s.children.map { c =>
      if (c.children.nonEmpty)
        throw ParseError(s"${s.name}.${c.name}: relations nest one level only")
      (c.name, c.out)
    }.distinct
    if (pairs.isEmpty) throw ParseError(s"${s.name}: empty selection set")
    val (nOrderBy, nDesc) = orderAndDesc(s.args)
    NestedQuery(s.name, argCondition(s.args), argLong(s.args, "first"),
      nOrderBy, nDesc, pairs.map(_._1),
      outputName = s.out, outputs = pairs.map(_._2))
  }

  private def toFieldQuery(s: Sel): FieldQuery = {
    checkArgNames(s, Set("condition", "first", "offset", "orderBy", "desc", "after"))
    // (column, response key) pairs — the column list is the SQL
    // projection, the keys are what the JSON renders under
    val cols = scala.collection.mutable.ListBuffer[(String, String)]()
    val nested = scala.collection.mutable.ListBuffer[NestedQuery]()
    var wantEdges = false
    var pageInfo = Seq.empty[String]
    def addCols(cs: Seq[Sel], ctx: String): Unit = cs.foreach { c =>
      if (c.children.nonEmpty) throw ParseError(s"$ctx.${c.name}: expected a scalar field")
      if (!cols.contains((c.name, c.out))) cols += ((c.name, c.out))
    }
    // connection-shape fields render under fixed keys; an alias there
    // would be silently dropped, so reject it loudly (r7 accepted and
    // ignored it — wrong response keys with no error)
    def noAlias(sel: Sel, ctx: String): Unit = sel.alias.foreach { a =>
      throw ParseError(s"$ctx: alias '$a' is not supported here " +
        "(aliases apply to data fields and relations)")
    }
    s.children.foreach {
      case c @ Sel("totalCount", _, Nil) => noAlias(c, "totalCount")
      case c @ Sel("nodes", _, kids) if kids.nonEmpty =>
        noAlias(c, "nodes"); addCols(kids, "nodes")
      case c @ Sel("edges", _, kids) if kids.nonEmpty =>
        noAlias(c, "edges")
        wantEdges = true
        kids.foreach {
          case k @ Sel("cursor", _, Nil) => noAlias(k, "edges.cursor")
          case k @ Sel("node", _, nodeKids) if nodeKids.nonEmpty =>
            noAlias(k, "edges.node"); addCols(nodeKids, "node")
          case other => throw ParseError(
            s"edges.${other.name}: expected 'cursor' or 'node { … }'")
        }
      case c @ Sel("pageInfo", _, kids) if kids.nonEmpty =>
        noAlias(c, "pageInfo")
        kids.foreach { k =>
          if (k.children.nonEmpty || !PageInfoFields.contains(k.name))
            throw ParseError(s"pageInfo.${k.name}: expected one of ${PageInfoFields.mkString(", ")}")
          noAlias(k, s"pageInfo.${k.name}")
        }
        pageInfo = kids.map(_.name)
      case c if c.children.nonEmpty => nested += toNested(c)
      case c => if (!cols.contains((c.name, c.out))) cols += ((c.name, c.out))
    }
    if (cols.isEmpty && nested.isEmpty)
      throw ParseError(s"${s.name}: empty selection set")
    val (fOrderBy, fDesc) = orderAndDesc(s.args)
    FieldQuery(s.name, argCondition(s.args), argLong(s.args, "first"),
      argLong(s.args, "offset"), fOrderBy, fDesc,
      cols.map(_._1).toSeq, argStr(s.args, "after"), wantEdges, pageInfo, nested.toSeq,
      outputName = s.out, outputs = cols.map(_._2).toSeq)
  }

  /** Parse a document into root field queries. Introspection roots
    * (`__schema`/`__type`) are rejected here — [[execute]] handles them
    * before this interpretation. */
  def parse(q: String): Seq[FieldQuery] =
    parseDocument(q, Map.empty).map { s =>
      if (s.name.startsWith("__"))
        throw ParseError(s"${s.name}: introspection is only served over execute()")
      toFieldQuery(s)
    }

  // ---- compilation ---------------------------------------------------

  private def sqlLiteral(v: Any): String = v match {
    case null => "null"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case l: Long => l.toString
    case d: Double => d.toString
    case b: Boolean => b.toString
    case EnumVal(n) => throw ParseError(
      s"enum value $n is not valid here (enum literals only apply to orderBy:)")
    case other => throw ParseError(s"unsupported literal $other")
  }

  /** Page-size policy: a query that omits `first` gets `defaultFirst`
    * rows, and no query can ask for more than `maxFirst` — the serving
    * driver must never `collect()` an unbounded result (one curl
    * without `first` against a 100 TB view would otherwise OOM it;
    * Postgraphile survives the same query by cursor-streaming from
    * Postgres, an executor we don't have under `collect`). */
  val DefaultPageSize = 100L
  val MaxPageSize = 10000L

  /** Opaque relay-style cursor: base64 of the row's absolute offset in
    * the field's total order. `after` resumes one past it — for an
    * offset-paginated backend the cursor IS the offset, the opacity is
    * the API contract (clients must not fabricate cursors). */
  private[serving] def encodeCursor(pos: Long): String =
    java.util.Base64.getEncoder.encodeToString(
      s"o:$pos".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[serving] def decodeCursor(s: String): Long = {
    val decoded =
      try new String(java.util.Base64.getDecoder.decode(s),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: IllegalArgumentException => throw ParseError(s"malformed cursor '$s'") }
    if (!decoded.startsWith("o:")) throw ParseError(s"malformed cursor '$s'")
    try decoded.stripPrefix("o:").toLong
    catch { case _: NumberFormatException => throw ParseError(s"malformed cursor '$s'") }
  }

  /** Resolve the page window: (limit, absolute offset). `after` is the
    * cursor base, explicit `offset` stacks on top of it. */
  private def pageWindow(f: FieldQuery, defaultFirst: Long, maxFirst: Long): (Long, Long) = {
    f.first.foreach(n => if (n < 0) throw ParseError(s"first: must be non-negative, got $n"))
    f.offset.foreach(n => if (n < 0) throw ParseError(s"offset: must be non-negative, got $n"))
    val cursorBase = f.after.map(c => decodeCursor(c) + 1).getOrElse(0L)
    (math.min(f.first.getOrElse(defaultFirst), maxFirst),
      cursorBase + f.offset.getOrElse(0L))
  }

  private def whereClause(conds: Seq[(String, Any)], checkCol: String => String): String =
    if (conds.isEmpty) ""
    else " where " + conds.map { case (k, v) =>
      if (v == null) s"${checkCol(k)} is null" else s"${checkCol(k)} = ${sqlLiteral(v)}"
    }.mkString(" and ")

  private def colChecker(spark: SparkSession, view: String): String => String = {
    val schema =
      try spark.table(view).schema
      catch { case _: Exception => throw ParseError(s"unknown table or view '$view'") }
    val cols = schema.fieldNames.toSet
    (c: String) =>
      if (cols(c)) s"`$c`"
      else throw ParseError(s"'$view' has no field '$c' (has: ${schema.fieldNames.mkString(", ")})")
  }

  /** Compile one root field to a single Spark SQL statement. Every
    * identifier is checked against the view's actual schema — unknown
    * views and fields fail here, and names never reach the SQL text
    * unvalidated. The LIMIT is always present: `first` defaults to
    * `defaultFirst` and is clamped to `maxFirst` (negative is an
    * error), so the compiled statement is bounded by construction.
    * `extraCols` are appended AFTER the visible selections (relation
    * parent keys the response renderer needs but the client didn't
    * select). */
  def compile(spark: SparkSession, f: FieldQuery,
              defaultFirst: Long = DefaultPageSize,
              maxFirst: Long = MaxPageSize,
              extraCols: Seq[String] = Nil): String = {
    val checkCol = colChecker(spark, f.view)
    val select = (f.selections ++ extraCols).map(checkCol).mkString(", ")
    val order = f.orderBy.map(c => s" order by ${checkCol(c)}" + (if (f.desc) " desc" else "")).getOrElse("")
    val (limit, offset) = pageWindow(f, defaultFirst, maxFirst)
    val offsetSql = if (offset > 0) s" offset $offset" else ""
    s"select $select from `${f.view}`${whereClause(f.condition, checkCol)}$order limit $limit$offsetSql"
  }

  /** The `totalCount` twin of [[compile]]: same view, same WHERE, no
    * page window — Postgraphile's connection semantics, where
    * `totalCount` is the number of rows matching the condition, not
    * the page length. */
  def compileCount(spark: SparkSession, f: FieldQuery): String = {
    val checkCol = colChecker(spark, f.view)
    s"select count(*) from `${f.view}`${whereClause(f.condition, checkCol)}"
  }

  /** Compile a relation's child query for one parent page: key IN-list
    * (the page's ≤ maxFirst distinct parent keys) + per-parent
    * `row_number` cap — ONE bounded statement for the whole page, the
    * compiled form of the dataloader pattern. Default per-parent order
    * is the child key (stable paging needs an explicit orderBy, same
    * contract as the root field). */
  def compileNested(spark: SparkSession, n: NestedQuery, rel: Relation,
                    parentKeys: Seq[Any],
                    defaultFirst: Long = DefaultPageSize,
                    maxFirst: Long = MaxPageSize): String = {
    val checkCol = colChecker(spark, rel.childView)
    n.first.foreach(x => if (x < 0) throw ParseError(s"first: must be non-negative, got $x"))
    val childFirst = math.min(n.first.getOrElse(defaultFirst), maxFirst)
    val key = checkCol(rel.childKey)
    // positional inner aliases: a column selected twice (two response
    // aliases) would make the bare name ambiguous in the outer select
    val selsInner = n.selections.zipWithIndex
      .map { case (c, i) => s"${checkCol(c)} as __c$i" }.mkString(", ")
    val selsOuter = n.selections.indices.map(i => s"__c$i").mkString(", ")
    val ord = n.orderBy.map(c => checkCol(c) + (if (n.desc) " desc" else "")).getOrElse(key)
    val inList = parentKeys.map(sqlLiteral).mkString(", ")
    val keyFilter = s" where $key in ($inList)"
    val conds = whereClause(n.condition, checkCol)
      .replaceFirst("^ where ", " and ") // appended after the IN-list filter
    s"""select __k, $selsOuter from (
       |  select $key as __k, $selsInner,
       |    row_number() over (partition by $key order by $ord) as __rn
       |  from `${rel.childView}`$keyFilter$conds
       |) where __rn <= $childFirst""".stripMargin
  }

  // ---- introspection -------------------------------------------------

  /** Spark type → GraphQL (type name, kind), Postgraphile's scalar
    * naming where one exists. */
  private def gqlType(dt: DataType): (String, String) = dt match {
    case LongType => ("BigInt", "SCALAR")
    case IntegerType | ShortType | ByteType => ("Int", "SCALAR")
    case DoubleType | FloatType => ("Float", "SCALAR")
    case StringType => ("String", "SCALAR")
    case BooleanType => ("Boolean", "SCALAR")
    case TimestampType | TimestampNTZType => ("Datetime", "SCALAR")
    case DateType => ("Date", "SCALAR")
    case _: DecimalType => ("BigFloat", "SCALAR")
    case BinaryType => ("Base64EncodedBinary", "SCALAR")
    case _: ArrayType => ("List", "LIST")
    case _: StructType => ("Struct", "OBJECT")
    case _ => ("String", "SCALAR")
  }

  /** Introspection type reference: named scalar/object at the core,
    * NON_NULL / LIST wrappers around it — the real meta-schema shape,
    * so a generated client can walk `ofType` chains to the named
    * type. Wrapper types are anonymous (`name: null`), named types
    * terminate the chain (`ofType: null`), per the spec. */
  private sealed trait TRef
  private case class TNamed(name: String, kind: String) extends TRef
  private case class TWrap(kind: String, of: TRef) extends TRef

  private def typeRefOf(dt: DataType, nullable: Boolean): TRef = {
    val base = dt match {
      case ArrayType(et, containsNull) => TWrap("LIST", typeRefOf(et, containsNull))
      case other => val (n, k) = gqlType(other); TNamed(n, k)
    }
    if (nullable) base else TWrap("NON_NULL", base)
  }

  private def renderTypeRef(node: ObjectNode, sels: Seq[Sel], t: TRef): Unit =
    sels.foreach {
      case Sel("name", _, Nil) => t match {
        case TNamed(n, _) => node.put("name", n)
        case _: TWrap => node.putNull("name")
      }
      case Sel("kind", _, Nil) =>
        node.put("kind", t match { case TNamed(_, k) => k; case TWrap(k, _) => k })
      case Sel("ofType", _, kids) => t match {
        case TWrap(_, of) => renderTypeRef(node.putObject("ofType"), kids, of)
        case _: TNamed => node.putNull("ofType")
      }
      case other => throw ParseError(s"type.${other.name}: unsupported introspection field")
    }

  // ---- introspection meta-model (r10) --------------------------------
  //
  // The schema is modelled as explicit types rather than rendered
  // ad-hoc from the catalog, so per-field `args`, `enumValues`, and
  // the connection shells introspect exactly like Postgraphile's
  // generated schema and the canonical graphql-js introspection
  // query (getIntrospectionQuery) executes in full — the contract
  // generated clients (graphql-codegen, Apollo) actually exercise.

  private case class GArg(name: String, tref: TRef,
                          defaultValue: Option[String] = None)
  private case class GField(name: String, tref: TRef, args: Seq[GArg] = Nil)
  private sealed trait GType { def name: String; def kind: String }
  private case class GScalarT(name: String) extends GType { val kind = "SCALAR" }
  private case class GEnumT(name: String, values: Seq[String]) extends GType {
    val kind = "ENUM"
  }
  private case class GObjectT(name: String, fields: Seq[GField],
                              interfaces: Seq[String] = Nil) extends GType {
    val kind = "OBJECT"
  }
  private case class GInputT(name: String, inputFields: Seq[GField]) extends GType {
    val kind = "INPUT_OBJECT"
  }
  private case class GAbstractT(name: String, kind: String, members: Seq[String],
                                ifaceFields: Option[Seq[GField]]) extends GType

  private def nn(t: TRef): TRef = TWrap("NON_NULL", t)
  private def listOf(t: TRef): TRef = TWrap("LIST", t)
  private val GInt = TNamed("Int", "SCALAR")
  private val GStringRef = TNamed("String", "SCALAR")
  private val GBool = TNamed("Boolean", "SCALAR")

  /** Postgraphile's generated-enum convention: `<COL>_ASC` /
    * `<COL>_DESC` per column. These are also ACCEPTED by the
    * executor's `orderBy:` argument (see [[orderByArg]]) so the
    * introspected type is honest. */
  private def orderByValues(cols: Seq[String]): Seq[String] =
    cols.flatMap(c => Seq(s"${c.toUpperCase}_ASC", s"${c.toUpperCase}_DESC"))

  /** Root-field argument list — the executor's exact surface
    * ([[toFieldQuery]]/[[executeUnionField]] `checkArgNames` sets). */
  private def rootArgs(target: String): Seq[GArg] = Seq(
    GArg("condition", TNamed(s"${target}Condition", "INPUT_OBJECT")),
    GArg("first", GInt, Some(DefaultPageSize.toString)),
    GArg("offset", GInt, Some("0")),
    GArg("orderBy", TNamed(s"${target}OrderBy", "ENUM")),
    GArg("desc", GBool, Some("false")),
    GArg("after", GStringRef))

  /** Relation-field argument list ([[toNested]]'s surface). */
  private def relArgs(child: String): Seq[GArg] = Seq(
    GArg("condition", TNamed(s"${child}Condition", "INPUT_OBJECT")),
    GArg("first", GInt),
    GArg("orderBy", TNamed(s"${child}OrderBy", "ENUM")),
    GArg("desc", GBool, Some("false")))

  /** The `<T>Connection`/`<T>Edge` pair wrapping a root target
    * (concrete view, union, or interface — `kind` tells the node
    * ref's kind). */
  private def connectionTypes(target: String, kind: String): Seq[GType] = Seq(
    GObjectT(s"${target}Connection", Seq(
      GField("nodes", nn(listOf(nn(TNamed(target, kind))))),
      GField("edges", nn(listOf(nn(TNamed(s"${target}Edge", "OBJECT"))))),
      GField("totalCount", nn(GInt)),
      GField("pageInfo", nn(TNamed("PageInfo", "OBJECT"))))),
    GObjectT(s"${target}Edge", Seq(
      GField("cursor", nn(GStringRef)),
      GField("node", nn(TNamed(target, kind))))))

  /** Condition + OrderBy companion types for a field set. Condition
    * entries are always-optional equality filters (what
    * [[whereClause]] executes). */
  private def companionTypes(target: String, fields: Seq[StructField]): Seq[GType] = Seq(
    GInputT(s"${target}Condition",
      fields.map(sf => GField(sf.name, typeRefOf(sf.dataType, nullable = true)))),
    GEnumT(s"${target}OrderBy", orderByValues(fields.map(_.name))))

  /** The introspection META-SCHEMA as first-class types (r16,
    * closing the r15 verdict's declared boundary): `__Schema`,
    * `__Type`, `__Field`, `__InputValue`, `__EnumValue`,
    * `__Directive` and the `__TypeKind`/`__DirectiveLocation` enums
    * are PART of a spec-compliant schema's type set — graphql-js and
    * Postgraphile list them under `__schema { types }` and resolve
    * `__type(name: "__Type")`, and schema-diffing tools read
    * `__Type.fields(includeDeprecated:)`'s own args from exactly
    * here. Shapes follow the spec's §introspection definitions. */
  private def metaSchemaTypes: Seq[GType] = {
    val tRef = TNamed("__Type", "OBJECT")
    val inputValue = TNamed("__InputValue", "OBJECT")
    val incDep = GArg("includeDeprecated", GBool, Some("false"))
    Seq(
      GObjectT("__Schema", Seq(
        GField("description", GStringRef),
        GField("types", nn(listOf(nn(tRef)))),
        GField("queryType", nn(tRef)),
        GField("mutationType", tRef),
        GField("subscriptionType", tRef),
        GField("directives", nn(listOf(nn(TNamed("__Directive", "OBJECT"))))))),
      GObjectT("__Type", Seq(
        GField("kind", nn(TNamed("__TypeKind", "ENUM"))),
        GField("name", GStringRef),
        GField("description", GStringRef),
        GField("specifiedByURL", GStringRef),
        GField("fields", listOf(nn(TNamed("__Field", "OBJECT"))), Seq(incDep)),
        GField("interfaces", listOf(nn(tRef))),
        GField("possibleTypes", listOf(nn(tRef))),
        GField("enumValues", listOf(nn(TNamed("__EnumValue", "OBJECT"))),
          Seq(incDep)),
        GField("inputFields", listOf(nn(inputValue))),
        GField("ofType", tRef))),
      GObjectT("__Field", Seq(
        GField("name", nn(GStringRef)),
        GField("description", GStringRef),
        GField("args", nn(listOf(nn(inputValue)))),
        GField("type", nn(tRef)),
        GField("isDeprecated", nn(GBool)),
        GField("deprecationReason", GStringRef))),
      GObjectT("__InputValue", Seq(
        GField("name", nn(GStringRef)),
        GField("description", GStringRef),
        GField("type", nn(tRef)),
        GField("defaultValue", GStringRef))),
      GObjectT("__EnumValue", Seq(
        GField("name", nn(GStringRef)),
        GField("description", GStringRef),
        GField("isDeprecated", nn(GBool)),
        GField("deprecationReason", GStringRef))),
      GObjectT("__Directive", Seq(
        GField("name", nn(GStringRef)),
        GField("description", GStringRef),
        GField("isRepeatable", nn(GBool)),
        GField("locations", nn(listOf(nn(TNamed("__DirectiveLocation", "ENUM"))))),
        GField("args", nn(listOf(nn(inputValue)))))),
      GEnumT("__TypeKind", Seq("SCALAR", "OBJECT", "INTERFACE", "UNION",
        "ENUM", "INPUT_OBJECT", "LIST", "NON_NULL")),
      GEnumT("__DirectiveLocation", Seq("QUERY", "MUTATION", "SUBSCRIPTION",
        "FIELD", "FRAGMENT_DEFINITION", "FRAGMENT_SPREAD", "INLINE_FRAGMENT",
        "VARIABLE_DEFINITION", "SCHEMA", "SCALAR", "OBJECT",
        "FIELD_DEFINITION", "ARGUMENT_DEFINITION", "INTERFACE", "UNION",
        "ENUM", "ENUM_VALUE", "INPUT_OBJECT", "INPUT_FIELD_DEFINITION")))
  }

  /** Build the full introspectable schema: Query, PageInfo, scalars,
    * the meta-schema ([[metaSchemaTypes]]), and per view / union /
    * interface its object (columns + derived relation fields with
    * args), Connection, Edge, Condition and OrderBy types.
    * Union/interface companions derive from the members'
    * (name, type)-intersection — the same column set their
    * cross-member orderBy/condition execution accepts. */
  private def buildSchema(spark: SparkSession, unions: Unions,
                          interfaces: Interfaces,
                          relations: Relations): Seq[GType] = {
    val views = catalogTypes(spark)
    val scalars = Seq("BigInt", "Int", "Float", "String", "Boolean",
      "Datetime", "Date", "BigFloat", "Base64EncodedBinary").map(GScalarT)
    val pageInfo = GObjectT("PageInfo", Seq(
      GField("hasNextPage", nn(GBool)),
      GField("hasPreviousPage", nn(GBool)),
      GField("startCursor", GStringRef),
      GField("endCursor", GStringRef)))
    val viewTypes = views.flatMap { case (name, schema) =>
      val rels = relations.collectFirst {
        case (k, m) if k.equalsIgnoreCase(name) => m
      }.getOrElse(Map.empty)
      val relFields = rels.toSeq.sortBy(_._1).map { case (fname, rel) =>
        GField(fname, listOf(nn(TNamed(rel.childView, "OBJECT"))),
          relArgs(rel.childView))
      }
      val obj = GObjectT(name,
        schema.fields.toSeq.map(sf =>
          GField(sf.name, typeRefOf(sf.dataType, sf.nullable))) ++ relFields,
        interfaces = interfaces.collect {
          case (in, ms) if ms.exists(_.equalsIgnoreCase(name)) => in
        }.toSeq)
      obj +: (connectionTypes(name, "OBJECT") ++ companionTypes(name, schema.fields.toSeq))
    }
    val abstractTypes = (
      unions.toSeq.map { case (n, ms) => (n, "UNION", ms) } ++
      interfaces.toSeq.map { case (n, ms) => (n, "INTERFACE", ms) }
    ).flatMap { case (n, kind, ms) =>
      val shared = interfaceFields(spark, ms)
      val abst = GAbstractT(n, kind, ms,
        if (kind == "INTERFACE")
          Some(shared.map(sf => GField(sf.name, typeRefOf(sf.dataType, sf.nullable))))
        else None)
      abst +: (connectionTypes(n, kind) ++ companionTypes(n, shared))
    }
    val query = GObjectT("Query",
      views.map { case (name, _) =>
        GField(name, nn(TNamed(s"${name}Connection", "OBJECT")), rootArgs(name))
      } ++ (unions.keys ++ interfaces.keys).toSeq.map { n =>
        GField(n, nn(TNamed(s"${n}Connection", "OBJECT")), rootArgs(n))
      })
    (query +: pageInfo +: scalars) ++ viewTypes ++ abstractTypes ++
      metaSchemaTypes
  }

  /** Render one GField (meta-schema `__Field`): name / args / type
    * plus the null-or-constant meta fields (description,
    * isDeprecated, deprecationReason) the canonical introspection
    * query selects. */
  private def renderField(fo: ObjectNode, kids: Seq[Sel], f: GField): Unit =
    kids.foreach {
      case Sel("name", _, Nil) => fo.put("name", f.name)
      case Sel("description", _, Nil) => fo.putNull("description")
      case Sel("type", _, tKids) => renderTypeRef(fo.putObject("type"), tKids, f.tref)
      case Sel("args", _, aKids) =>
        val arr = fo.putArray("args")
        f.args.foreach { a =>
          val ao = arr.addObject()
          aKids.foreach {
            case Sel("name", _, Nil) => ao.put("name", a.name)
            case Sel("description", _, Nil) => ao.putNull("description")
            case Sel("type", _, tKids) =>
              renderTypeRef(ao.putObject("type"), tKids, a.tref)
            case Sel("defaultValue", _, Nil) => a.defaultValue match {
              case Some(d) => ao.put("defaultValue", d)
              case None => ao.putNull("defaultValue")
            }
            case other => throw ParseError(
              s"args.${other.name}: unsupported introspection field")
          }
        }
      case Sel("isDeprecated", _, Nil) => fo.put("isDeprecated", false)
      case Sel("deprecationReason", _, Nil) => fo.putNull("deprecationReason")
      case other => throw ParseError(
        s"fields.${other.name}: unsupported introspection field")
    }

  /** Render one GType (meta-schema `__Type`): every field of the
    * canonical introspection query's FullType fragment answers —
    * fields with per-field args, inputFields, enumValues, interfaces,
    * possibleTypes; inapplicable kinds answer null per the spec. */
  private def renderType(node: ObjectNode, sels: Seq[Sel], t: GType): Unit =
    sels.foreach {
      case Sel("name", _, Nil) => node.put("name", t.name)
      case Sel("kind", _, Nil) => node.put("kind", t.kind)
      case Sel("description", _, Nil) => node.putNull("description")
      case Sel("specifiedByURL", _, Nil) | Sel("specifiedByUrl", _, Nil) =>
        node.putNull("specifiedByURL")
      case Sel("ofType", _, _) => node.putNull("ofType") // named types end the chain
      case Sel("fields", _, kids) =>
        val fs: Option[Seq[GField]] = t match {
          case o: GObjectT => Some(o.fields)
          case a: GAbstractT => a.ifaceFields // interface: derived set; union: null
          case _ => None
        }
        fs match {
          case None => node.putNull("fields")
          case Some(list) =>
            val arr = node.putArray("fields")
            list.foreach(f => renderField(arr.addObject(), kids, f))
        }
      case Sel("inputFields", _, kids) => t match {
        case i: GInputT =>
          val arr = node.putArray("inputFields")
          i.inputFields.foreach { f =>
            val fo = arr.addObject()
            kids.foreach {
              case Sel("name", _, Nil) => fo.put("name", f.name)
              case Sel("description", _, Nil) => fo.putNull("description")
              case Sel("type", _, tKids) =>
                renderTypeRef(fo.putObject("type"), tKids, f.tref)
              case Sel("defaultValue", _, Nil) => fo.putNull("defaultValue")
              case other => throw ParseError(
                s"inputFields.${other.name}: unsupported introspection field")
            }
          }
        case _ => node.putNull("inputFields")
      }
      case Sel("enumValues", _, kids) => t match {
        case e: GEnumT =>
          val arr = node.putArray("enumValues")
          e.values.foreach { v =>
            val vo = arr.addObject()
            kids.foreach {
              case Sel("name", _, Nil) => vo.put("name", v)
              case Sel("description", _, Nil) => vo.putNull("description")
              case Sel("isDeprecated", _, Nil) => vo.put("isDeprecated", false)
              case Sel("deprecationReason", _, Nil) => vo.putNull("deprecationReason")
              case other => throw ParseError(
                s"enumValues.${other.name}: unsupported introspection field")
            }
          }
        case _ => node.putNull("enumValues")
      }
      case Sel("interfaces", _, kids) => t match {
        case o: GObjectT =>
          val arr = node.putArray("interfaces")
          o.interfaces.foreach(in =>
            renderTypeRef(arr.addObject(), kids, TNamed(in, "INTERFACE")))
        case a: GAbstractT if a.kind == "INTERFACE" =>
          node.putArray("interfaces"): Unit // spec: empty list on interfaces
        case _ => node.putNull("interfaces")
      }
      case Sel("possibleTypes", _, kids) => t match {
        case a: GAbstractT =>
          val arr = node.putArray("possibleTypes")
          a.members.foreach(m =>
            renderTypeRef(arr.addObject(), kids, TNamed(m, "OBJECT")))
        case _ => node.putNull("possibleTypes")
      }
      case other => throw ParseError(s"${other.name}: unsupported introspection field")
    }

  /** An interface's derived field set: the members' schema
    * intersection by (name, type), in the first member's field
    * order. */
  private def interfaceFields(spark: SparkSession,
                              members: Seq[String]): Seq[StructField] =
    members.headOption.map { first =>
      val rest = members.tail.map(m => spark.table(m).schema)
      spark.table(first).schema.fields.toSeq.filter(f =>
        rest.forall(_.fields.exists(g =>
          g.name == f.name && g.dataType == f.dataType)))
    }.getOrElse(Nil)

  private def catalogTypes(spark: SparkSession): Seq[(String, StructType)] =
    spark.catalog.listTables().collect().toSeq
      .map(t => t.name -> spark.table(t.name).schema)

  private def renderIntrospection(spark: SparkSession, data: ObjectNode, s: Sel,
                                  unions: Unions = Map.empty,
                                  interfaces: Interfaces = Map.empty,
                                  relations: Relations = Map.empty): Unit = {
    lazy val allTypes = buildSchema(spark, unions, interfaces, relations)
    s.name match {
      case "__schema" =>
        val out = data.putObject(s.out)
        s.children.foreach {
          case Sel("queryType", _, kids) =>
            // the full Query type renders here, so
            // `queryType { fields { name args { … } } }` introspects
            // every root field's argument surface in place
            renderType(out.putObject("queryType"), kids,
              allTypes.find(_.name == "Query").get)
          case Sel("mutationType", _, _) =>
            out.putNull("mutationType") // read-only surface
          case Sel("subscriptionType", _, _) =>
            // subscriptions are served on a separate SSE endpoint
            // (ServeSubscriptions) with the same grammar; the HTTP
            // query schema itself carries no Subscription type
            out.putNull("subscriptionType")
          case Sel("types", _, kids) =>
            val arr = out.putArray("types")
            allTypes.foreach(t => renderType(arr.addObject(), kids, t))
          case Sel("directives", _, kids) =>
            val arr = out.putArray("directives")
            Seq("skip", "include").foreach { dn =>
              val o = arr.addObject()
              kids.foreach {
                case Sel("name", _, Nil) => o.put("name", dn)
                case Sel("description", _, Nil) => o.putNull("description")
                case Sel("isRepeatable", _, Nil) => o.put("isRepeatable", false)
                case Sel("locations", _, Nil) =>
                  val la = o.putArray("locations")
                  // evaluated per selection (fields, fragment spreads,
                  // inline fragments — the spec's executable trio)
                  la.add("FIELD")
                  la.add("FRAGMENT_SPREAD")
                  la.add("INLINE_FRAGMENT")
                case Sel("args", _, akids) =>
                  val ao = o.putArray("args").addObject()
                  akids.foreach {
                    case Sel("name", _, Nil) => ao.put("name", "if")
                    case Sel("description", _, Nil) => ao.putNull("description")
                    case Sel("type", _, tKids) =>
                      renderTypeRef(ao.putObject("type"), tKids, nn(GBool))
                    case Sel("defaultValue", _, Nil) => ao.putNull("defaultValue")
                    case other => throw ParseError(
                      s"directives.args.${other.name}: unsupported introspection field")
                  }
                case other => throw ParseError(
                  s"directives.${other.name}: unsupported introspection field")
              }
            }
          case other => throw ParseError(s"__schema.${other.name}: unsupported introspection field")
        }
      case "__type" =>
        val name = argStr(s.args, "name")
          .getOrElse(throw ParseError("__type: missing name argument"))
        allTypes.find(_.name == name) match {
          case Some(t) => renderType(data.putObject(s.out), s.children, t)
          case None => data.putNull(s.out)
        }
      case other => throw ParseError(s"$other: unknown introspection field")
    }
  }

  // ---- execution -----------------------------------------------------

  private val mapper = new ObjectMapper()

  /** Row-value → JSON field, shared with [[Subscriptions]]' renderer. */
  private[serving] def putValueOn(node: ObjectNode, name: String, v: Any): Unit =
    putValue(node, name, v)

  private def putValue(node: ObjectNode, name: String, v: Any): Unit = v match {
    case null => node.putNull(name)
    case s: String => node.put(name, s)
    case l: Long => node.put(name, l)
    case i: Int => node.put(name, i)
    case d: Double => node.put(name, d)
    case f: Float => node.put(name, f.toDouble)
    case b: Boolean => node.put(name, b)
    case d: java.math.BigDecimal => node.put(name, d)
    case d: scala.math.BigDecimal => node.put(name, d.bigDecimal)
    case other => node.put(name, other.toString) // timestamp/date/binary render as text
  }

  /** Execute a GraphQL document against the session catalog; returns
    * the response JSON (`{"data": …}` or `{"errors": [{"message": …}]}`
    * — the GraphQL wire contract). Each root field yields
    * Postgraphile's connection shape: `nodes` (the always-bounded
    * page), `totalCount` (full match count from a separate count(*) —
    * an aggregate, so it collects one row no matter the view size),
    * plus `edges`/`pageInfo` when selected. Selected relations run as
    * one additional bounded query each (see [[compileNested]]). */
  def execute(spark: SparkSession, query: String,
              defaultFirst: Long = DefaultPageSize,
              maxFirst: Long = MaxPageSize,
              relations: Relations = Map.empty,
              variables: Map[String, Any] = Map.empty,
              unions: Unions = Map.empty,
              interfaces: Interfaces = Map.empty): String = {
    val root = mapper.createObjectNode()
    try {
      val roots = parseDocument(query, variables, relations, unions ++ interfaces)
      val data = root.putObject("data")
      roots.foreach { s =>
        if (s.name.startsWith("__"))
          renderIntrospection(spark, data, s, unions, interfaces, relations)
        else interfaces.find(_._1.equalsIgnoreCase(s.name)) match {
          case Some((in, ms)) =>
            executeUnionField(spark, data, s, in, ms, defaultFirst, maxFirst,
              relations, iface = true)
          case None => unions.find(_._1.equalsIgnoreCase(s.name)) match {
            case Some((un, ms)) =>
              executeUnionField(spark, data, s, un, ms, defaultFirst, maxFirst,
                relations)
            case None =>
              executeField(spark, data, toFieldQuery(s), defaultFirst, maxFirst, relations)
          }
        }
      }
    } catch {
      case e: ParseError =>
        root.removeAll()
        root.putArray("errors").addObject().put("message", e.msg)
      case e: Exception =>
        root.removeAll()
        root.putArray("errors").addObject().put("message", e.toString)
    }
    mapper.writeValueAsString(root)
  }

  /** Execute a UNION root field ([[Unions]] scaladoc has the model).
    * The page query is ONE statement over all members; `totalCount`
    * is one UNION ALL count. Rendering dispatches per row on the
    * member tag: `__typename` renders the member view's registered
    * name, and only the row's own member fragment fields render —
    * exactly GraphQL's union contract. */
  private def executeUnionField(spark: SparkSession, data: ObjectNode, s: Sel,
                                unionName: String, members: Seq[String],
                                defaultFirst: Long, maxFirst: Long,
                                relations: Relations = Map.empty,
                                iface: Boolean = false): Unit = {
    val kindWord = if (iface) "interface" else "union"
    checkArgNames(s, Set("condition", "first", "offset", "orderBy", "desc", "after"))
    if (members.isEmpty) throw ParseError(s"$kindWord '$unionName' has no members")
    // validates every member view exists, up front
    val checkers = members.map(m => m -> colChecker(spark, m))
    val schemas = members.map(m => m -> spark.table(m).schema).toMap
    var wantEdges = false
    var pageInfo = Seq.empty[String]
    val typenameKeys = scala.collection.mutable.LinkedHashSet[String]()
    // interface-legal bare fields: present on EVERY member under ONE
    // data type — the derived interface field set
    val sharedCols = scala.collection.mutable.LinkedHashSet[(String, String)]()
    val memberCols = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashSet[(String, String)]]()
    members.foreach(m => memberCols(m) =
      scala.collection.mutable.LinkedHashSet.empty[(String, String)])
    // relation selections under `... on <member>` fragments (r10):
    // member-scoped, so they resolve against the MEMBER's relation
    // registry and render only on that member's rows — no shared-slot
    // ambiguity by construction
    val memberNested = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ListBuffer[(NestedQuery, Relation)]]()
    members.foreach(m => memberNested(m) =
      scala.collection.mutable.ListBuffer.empty[(NestedQuery, Relation)])
    def memberRels(m: String): Map[String, Relation] =
      relations.collectFirst { case (k, v) if k.equalsIgnoreCase(m) => v }
        .getOrElse(Map.empty)
    def addShared(c: Sel, ctx: String): Unit = {
      val types = members.map { m =>
        m -> schemas(m).fields.find(_.name == c.name).map(_.dataType)
      }
      val missing = types.collect { case (m, None) => m }
      if (missing.nonEmpty) throw ParseError(
        s"$ctx.${c.name}: not an interface field of '$unionName' — missing on " +
          s"${missing.mkString(", ")} (bare fields must exist on every member; " +
          "narrow with `... on <member>` fragments)")
      if (types.flatMap(_._2).distinct.size > 1) throw ParseError(
        s"$ctx.${c.name}: members disagree on the type (" +
          types.map { case (m, t) => s"$m: ${t.get.simpleString}" }.mkString(", ") +
          ") — narrow with `... on <member>` fragments")
      sharedCols += ((c.name, c.out))
    }
    def addUnionSels(kids: Seq[Sel], ctx: String): Unit = kids.foreach { k =>
      k.onType match {
        case Some(on) =>
          val m = members.find(_.equalsIgnoreCase(on)).getOrElse(throw ParseError(
            s"$ctx: '... on $on' is not a member of $kindWord '$unionName' " +
              s"(members: ${members.mkString(", ")})"))
          k.children.foreach { c =>
            if (c.children.nonEmpty) memberRels(m).get(c.name) match {
              // r10: a relation field inside the member fragment —
              // interpreted exactly like a concrete-type relation
              // (toNested validates args and scalar-only children),
              // executed as one bounded child query for the member's
              // page rows
              case Some(rel) => memberNested(m) += ((toNested(c), rel))
              case None =>
                val has = memberRels(m).keys
                throw ParseError(
                  s"$ctx.$on.${c.name}: '$m' has no relation '${c.name}'" +
                    (if (has.isEmpty) "" else s" (has: ${has.mkString(", ")})"))
            }
            else if (c.name == "__typename") typenameKeys += c.out
            else memberCols(m) += ((c.name, c.out))
          }
        case None =>
          if (k.name == "__typename" && k.children.isEmpty) typenameKeys += k.out
          else if (iface && k.children.isEmpty) addShared(k, ctx)
          else if (k.children.nonEmpty &&
              members.exists(m => memberRels(m).contains(k.name)))
            // the genuinely ambiguous shared-slot case: a BARE
            // relation field would have to fan out per member with
            // per-member child types under one response key — stated
            // boundary, with the working spelling named
            throw ParseError(s"$ctx.${k.name}: bare relation fields on a " +
              s"$kindWord are ambiguous across members — select it inside " +
              s"a `... on <member>` fragment")
          else throw ParseError(s"$ctx.${k.name}: a union selection set takes " +
            "__typename and inline fragments (`... on <member>`) only")
      }
    }
    def noUnionAlias(sel: Sel, ctx: String): Unit = sel.alias.foreach { a =>
      throw ParseError(s"$ctx: alias '$a' is not supported here " +
        "(aliases apply to data fields)")
    }
    s.children.foreach {
      case c @ Sel("totalCount", _, Nil) if c.onType.isEmpty =>
        noUnionAlias(c, "totalCount")
      case c @ Sel("nodes", _, kids) if kids.nonEmpty && c.onType.isEmpty =>
        noUnionAlias(c, "nodes"); addUnionSels(kids, "nodes")
      case c @ Sel("edges", _, kids) if kids.nonEmpty && c.onType.isEmpty =>
        noUnionAlias(c, "edges")
        wantEdges = true
        kids.foreach {
          case k @ Sel("cursor", _, Nil) => noUnionAlias(k, "edges.cursor")
          case k @ Sel("node", _, nodeKids) if nodeKids.nonEmpty =>
            noUnionAlias(k, "edges.node"); addUnionSels(nodeKids, "node")
          case other => throw ParseError(
            s"edges.${other.name}: expected 'cursor' or 'node { … }'")
        }
      case c @ Sel("pageInfo", _, kids) if kids.nonEmpty && c.onType.isEmpty =>
        noUnionAlias(c, "pageInfo")
        kids.foreach { k =>
          if (k.children.nonEmpty || !PageInfoFields.contains(k.name))
            throw ParseError(
              s"pageInfo.${k.name}: expected one of ${PageInfoFields.mkString(", ")}")
          noUnionAlias(k, s"pageInfo.${k.name}")
        }
        pageInfo = kids.map(_.name)
      case c => throw ParseError(
        s"$unionName.${c.name}: expected nodes/edges/pageInfo/totalCount")
    }
    if (typenameKeys.isEmpty && sharedCols.isEmpty &&
        memberCols.values.forall(_.isEmpty) &&
        memberNested.values.forall(_.isEmpty))
      throw ParseError(s"$unionName: empty selection set")
    val condition = argCondition(s.args)
    val (orderBy, desc) = orderAndDesc(s.args)
    // the cross-member order/filter contract: these columns must
    // exist on EVERY member (each checker throws its own view's
    // field list on a miss) AND agree on the data type — the __ord /
    // condition slots sit in one UNION position, so a bigint-vs-string
    // disagreement would otherwise UNION-coerce and silently order
    // lexicographically across members (the addShared rule, applied
    // to arguments)
    (condition.map(_._1) ++ orderBy).foreach { c =>
      checkers.foreach { case (_, ck) => ck(c) }
      val types = members.map { m =>
        m -> schemas(m).fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
      }
      if (types.flatMap(_._2).distinct.size > 1) throw ParseError(
        s"$unionName: members disagree on the type of '$c' (" +
          types.collect { case (m, Some(t)) => s"$m: ${t.simpleString}" }
            .mkString(", ") +
          ") — it cannot order or filter across members; narrow with " +
          "`... on <member>` fragments")
    }
    val shim = FieldQuery(unionName, condition, argLong(s.args, "first"),
      argLong(s.args, "offset"), orderBy, desc, Nil, argStr(s.args, "after"),
      wantEdges, pageInfo, Nil)
    val (limit, offset) = pageWindow(shim, defaultFirst, maxFirst)
    // slots: interface-shared columns first (every member fills them
    // — one intersection-checked type), then per-(member, column)
    // slots that a member's branch fills and the rest NULL-pad, so
    // same-named columns of DIFFERENT types across members can never
    // meet in one UNION position
    val sharedSlotCols: Seq[String] = sharedCols.toSeq.map(_._1).distinct
    val nShared = sharedSlotCols.length
    // relation parent keys ride along as hidden per-member slots
    // (the executeField hidden-trailing-columns move, slot-shaped)
    val hiddenKeys: Map[String, Seq[String]] = members.map { m =>
      m -> memberNested(m).map(_._2.parentKey).distinct
        .filterNot(k => memberCols(m).exists(_._1 == k)).toSeq
    }.toMap
    val slots: Seq[(String, String)] = memberCols.toSeq.flatMap {
      case (m, cols) =>
        (cols.toSeq.map(_._1).distinct ++ hiddenKeys(m)).map(c => (m, c))
    }
    val slotIdx: Map[(String, String), Int] = slots.zipWithIndex.toMap
    val branches = checkers.map { case (m, ck) =>
      val sharedSql = sharedSlotCols.zipWithIndex.map { case (col, i) =>
        s"${ck(col)} as __u$i"
      }
      val slotSql = slots.zipWithIndex.map { case ((sm, col), i) =>
        if (sm == m) s"${ck(col)} as __u${nShared + i}"
        else s"null as __u${nShared + i}"
      }
      val ordCol = orderBy.map(c => s", ${ck(c)} as __ord").getOrElse("")
      val sel = (Seq(s"'${m.replace("'", "''")}' as __tn") ++ sharedSql ++ slotSql)
        .mkString(", ")
      s"select $sel$ordCol from `$m`${whereClause(condition, ck)}"
    }
    val order = orderBy.map(_ => " order by __ord" + (if (desc) " desc" else "")).getOrElse("")
    val offsetSql = if (offset > 0) s" offset $offset" else ""
    val outerCols = (Seq("__tn") ++
      (0 until nShared + slots.length).map(i => s"__u$i")).mkString(", ")
    val rows = spark.sql(
      s"select $outerCols from (\n${branches.mkString("\nunion all\n")}\n)" +
        s"$order limit $limit$offsetSql").collect()
    val total = spark.sql(
      s"select count(*) from (\n${checkers.map { case (m, ck) =>
        s"select 1 as __one from `$m`${whereClause(condition, ck)}"
      }.mkString("\nunion all\n")}\n)").head().getLong(0)
    // one bounded child query per (member, relation) for the whole
    // page — keyed by the member's own rows only, so a 2-member feed
    // with one relation each runs exactly 2 child queries, never one
    // per row
    val memberChild: Seq[(String, NestedQuery, Relation,
        Map[Any, Seq[org.apache.spark.sql.Row]])] =
      members.flatMap { m =>
        memberNested(m).toSeq.map { case (n, rel) =>
          val keys = rows.filter(_.getString(0) == m)
            .map(_.get(1 + nShared + slotIdx((m, rel.parentKey))))
            .filter(_ != null).distinct.toSeq
          val grouped =
            if (keys.isEmpty) Map.empty[Any, Seq[org.apache.spark.sql.Row]]
            else spark.sql(compileNested(spark, n, rel, keys, defaultFirst, maxFirst))
              .collect().toSeq.groupBy(_.get(0))
          (m, n, rel, grouped)
        }
      }
    val conn = data.putObject(s.out)
    val nodes: ArrayNode = conn.putArray("nodes")
    val sharedSlotIdx = sharedSlotCols.zipWithIndex.toMap
    def renderNode(o: ObjectNode, r: org.apache.spark.sql.Row): Unit = {
      val tn = r.getString(0)
      typenameKeys.foreach(k => putValue(o, k, tn))
      sharedCols.foreach { case (col, out) =>
        putValue(o, out, r.get(1 + sharedSlotIdx(col)))
      }
      memberCols.getOrElse(tn, scala.collection.mutable.LinkedHashSet.empty[(String, String)])
        .foreach { case (col, out) =>
          putValue(o, out, r.get(1 + nShared + slotIdx((tn, col))))
        }
      // a fragment's relation field renders only on its own member's
      // rows — the fragment-doesn't-apply rows simply lack the key
      memberChild.foreach { case (m, n, rel, grouped) =>
        if (m == tn) {
          val arr = o.putArray(n.outName)
          grouped.getOrElse(r.get(1 + nShared + slotIdx((tn, rel.parentKey))),
              Seq.empty).foreach { cr =>
            val co = arr.addObject()
            // child row layout: __k at 0, selections from 1 (the
            // executeField contract)
            n.outs.zipWithIndex.foreach { case (name, i) =>
              putValue(co, name, cr.get(i + 1))
            }
          }
        }
      }
    }
    rows.foreach(r => renderNode(nodes.addObject(), r))
    conn.put("totalCount", total)
    if (wantEdges) {
      val edges = conn.putArray("edges")
      rows.zipWithIndex.foreach { case (r, i) =>
        val e = edges.addObject()
        e.put("cursor", encodeCursor(offset + i))
        renderNode(e.putObject("node"), r)
      }
    }
    if (pageInfo.nonEmpty) {
      val pi = conn.putObject("pageInfo")
      pageInfo.foreach {
        case "hasNextPage" => pi.put("hasNextPage", offset + rows.length < total)
        case "hasPreviousPage" => pi.put("hasPreviousPage", offset > 0)
        case "startCursor" =>
          if (rows.isEmpty) pi.putNull("startCursor")
          else pi.put("startCursor", encodeCursor(offset))
        case "endCursor" =>
          if (rows.isEmpty) pi.putNull("endCursor")
          else pi.put("endCursor", encodeCursor(offset + rows.length - 1))
      }
    }
  }

  private def executeField(spark: SparkSession, data: ObjectNode, f: FieldQuery,
                           defaultFirst: Long, maxFirst: Long,
                           relations: Relations): Unit = {
    // resolve selected relations against the registry up front —
    // case-insensitively, matching Spark's own view-name resolution
    // (the catalog lowercases registered names, so a derived registry
    // keys `transfer_…` while the user may type `Transfer_…`)
    val viewRels = relations.collectFirst {
      case (k, v) if k.equalsIgnoreCase(f.view) => v
    }.getOrElse(Map.empty)
    val resolved: Seq[(NestedQuery, Relation)] = f.nested.map { n =>
      viewRels.get(n.field) match {
        case Some(rel) => (n, rel)
        case None => throw ParseError(
          s"'${f.view}' has no relation '${n.field}'" +
            (if (viewRels.isEmpty) "" else s" (has: ${viewRels.keys.mkString(", ")})"))
      }
    }
    // parent keys ride along as hidden trailing columns
    val hiddenKeys = resolved.map(_._2.parentKey).distinct.filterNot(f.selections.contains)
    val df = spark.sql(compile(spark, f, defaultFirst, maxFirst, hiddenKeys))
    val rows = df.collect()
    val total = spark.sql(compileCount(spark, f)).head().getLong(0)
    val (_, pageOffset) = pageWindow(f, defaultFirst, maxFirst)

    // one bounded child query per selected relation, for the whole page
    def keyIdx(k: String): Int = {
      val i = f.selections.indexOf(k)
      if (i >= 0) i else f.selections.length + hiddenKeys.indexOf(k)
    }
    val childRows: Seq[(NestedQuery, Relation, Map[Any, Seq[org.apache.spark.sql.Row]])] =
      resolved.map { case (n, rel) =>
        val keys = rows.map(_.get(keyIdx(rel.parentKey))).filter(_ != null).distinct.toSeq
        if (keys.isEmpty) (n, rel, Map.empty[Any, Seq[org.apache.spark.sql.Row]])
        else {
          val grouped = spark.sql(
              compileNested(spark, n, rel, keys, defaultFirst, maxFirst))
            .collect().toSeq.groupBy(_.get(0))
          (n, rel, grouped)
        }
      }

    val conn = data.putObject(f.outName)
    val nodes: ArrayNode = conn.putArray("nodes")
    def renderNode(o: ObjectNode, r: org.apache.spark.sql.Row): Unit = {
      f.outs.zipWithIndex.foreach { case (name, i) => putValue(o, name, r.get(i)) }
      childRows.foreach { case (n, rel, grouped) =>
        val arr = o.putArray(n.outName)
        grouped.getOrElse(r.get(keyIdx(rel.parentKey)), Seq.empty).foreach { cr =>
          val co = arr.addObject()
          // child row layout: __k at 0, selections from 1; keys are the
          // response names (aliases when given), positions the columns
          n.outs.zipWithIndex.foreach { case (name, i) => putValue(co, name, cr.get(i + 1)) }
        }
      }
    }
    rows.foreach(r => renderNode(nodes.addObject(), r))
    conn.put("totalCount", total)
    if (f.wantEdges) {
      val edges = conn.putArray("edges")
      rows.zipWithIndex.foreach { case (r, i) =>
        val e = edges.addObject()
        e.put("cursor", encodeCursor(pageOffset + i))
        renderNode(e.putObject("node"), r)
      }
    }
    if (f.pageInfo.nonEmpty) {
      val pi = conn.putObject("pageInfo")
      f.pageInfo.foreach {
        case "hasNextPage" => pi.put("hasNextPage", pageOffset + rows.length < total)
        case "hasPreviousPage" => pi.put("hasPreviousPage", pageOffset > 0)
        case "startCursor" =>
          if (rows.isEmpty) pi.putNull("startCursor")
          else pi.put("startCursor", encodeCursor(pageOffset))
        case "endCursor" =>
          if (rows.isEmpty) pi.putNull("endCursor")
          else pi.put("endCursor", encodeCursor(pageOffset + rows.length - 1))
      }
    }
  }

  // ---- HTTP endpoint -------------------------------------------------

  /** Extract the GraphQL document from a POST body, dispatching on
    * Content-Type per the GraphQL-over-HTTP convention:
    * `application/json` → `{"query": "..."}` envelope,
    * `application/graphql` → raw document. With no (or another)
    * Content-Type, try the JSON envelope first and fall back to raw
    * text — prefix-sniffing would misread pretty-printed JSON (a
    * newline after `{`) as a raw document. */
  private[graft] def extractQuery(contentType: Option[String], body: String): String =
    extractQueryAndVars(contentType, body)._1

  /** JSON scalar/object → the parser's value representation (objects
    * become the same `Seq[(String, Any)]` shape `objectArg()` builds,
    * so a variable can carry a `condition:` object; arrays become
    * [[ListVal]] so list-typed variables validate — r11). */
  private def jsonToScala(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isNull) null
    else if (n.isTextual) n.asText
    else if (n.isBoolean) n.asBoolean
    else if (n.isIntegralNumber) n.asLong
    else if (n.isFloatingPointNumber) n.asDouble
    else if (n.isArray) ListVal(n.elements().asScala.map(jsonToScala).toSeq)
    else if (n.isObject) {
      val it = n.fields()
      val buf = scala.collection.mutable.ListBuffer[(String, Any)]()
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> jsonToScala(e.getValue) }
      buf.toSeq
    }
    else throw ParseError(s"unsupported variable value: ${n.getNodeType}")

  private[graft] def extractQueryAndVars(
      contentType: Option[String], body: String): (String, Map[String, Any]) = {
    val ct = contentType.getOrElse("").toLowerCase
    def fromJson: Option[(String, Map[String, Any])] =
      try {
        val node = mapper.readTree(body)
        if (node != null && node.isObject && node.has("query")) {
          val vars =
            if (node.has("variables") && node.get("variables").isObject) {
              val it = node.get("variables").fields()
              val buf = scala.collection.mutable.Map[String, Any]()
              while (it.hasNext) { val e = it.next(); buf += e.getKey -> jsonToScala(e.getValue) }
              buf.toMap
            } else Map.empty[String, Any]
          Some((node.get("query").asText, vars))
        } else None
      } catch { case _: Exception => None }
    if (ct.contains("application/json")) fromJson.getOrElse(("", Map.empty))
    else if (ct.contains("application/graphql")) (body, Map.empty)
    else fromJson.getOrElse((body, Map.empty))
  }

  /** Serve `POST /graphql` (body = raw query text, or JSON
    * `{"query": "..."}` — the standard GraphQL HTTP convention) from
    * the given session. Returns the bound port. */
  def serve(spark: SparkSession, port: Int,
            relations: Relations = Map.empty,
            unions: Unions = Map.empty,
            interfaces: Interfaces = Map.empty): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/graphql", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val (query, vars) = extractQueryAndVars(
        Option(ex.getRequestHeaders.getFirst("Content-Type")), body)
      val resp = execute(spark, query, relations = relations, variables = vars,
          unions = unions, interfaces = interfaces)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    server
  }
}
