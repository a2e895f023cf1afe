package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Public Suffix List rule sets for the native
  * [[PslDomain]] expression: label-count-indexed hash sets (index =
  * label count of the rule for `exact`/`exceptions`, BASE label
  * count for `wildcard`), built once per rule set and shipped to
  * executors as one broadcast-style reference object. */
final class PslCompiled(
    val exact: Array[java.util.HashSet[String]],
    val wildcard: Array[java.util.HashSet[String]],
    val exceptions: Array[java.util.HashSet[String]],
    val maxMatch: Int) extends Serializable

object PslDomainRuntime {

  def compile(
      exact: Map[Int, Set[String]],
      wildcard: Map[Int, Set[String]],
      exceptions: Map[Int, Set[String]]): PslCompiled = {
    val maxK = (exact.keys ++ wildcard.keys.map(_ + 1) ++
      exceptions.keys ++ Seq(1)).max
    def toArr(m: Map[Int, Set[String]]): Array[java.util.HashSet[String]] = {
      val a = Array.fill(maxK + 1)(new java.util.HashSet[String]())
      for ((k, s) <- m; v <- s if k <= maxK) a(k).add(v)
      a
    }
    new PslCompiled(toArr(exact), toArr(wildcard), toArr(exceptions), maxK)
  }

  /** The publicsuffix.org algorithm over one host — SEMANTICS
    * IDENTICAL to the column reference
    * (`Links.registeredDomainExpr`, spec-asserted row-identical):
    * lowercase, strip one trailing `:digits` port, IPv4 literals
    * pass whole, exception rules beat everything, else longest
    * exact/wildcard match, else the implicit `*`; the registered
    * domain keeps one label more than the prevailing suffix; a host
    * that IS a suffix (or shorter) passes whole. */
  def registeredDomain(host: UTF8String, c: PslCompiled): UTF8String = {
    val lowered = host.toLowerCase.toString
    // strip ONE trailing :digits+ (the column version's `:\d+$`)
    val ci = lowered.lastIndexOf(':')
    val h =
      if (ci >= 0 && ci < lowered.length - 1 &&
          lowered.substring(ci + 1).forall(ch => ch >= '0' && ch <= '9'))
        lowered.substring(0, ci)
      else lowered
    // split keeping empties (Spark's split semantics)
    val parts = h.split("\\.", -1)
    val n = parts.length
    // IPv4 literal: 4 parts of 1-3 ASCII digits
    if (n == 4 && parts.forall(p => p.length >= 1 && p.length <= 3 &&
        p.forall(ch => ch >= '0' && ch <= '9')))
      return UTF8String.fromString(h)
    def lastK(k: Int): String = {
      val sb = new java.lang.StringBuilder()
      var i = n - k
      while (i < n) {
        if (i > n - k) sb.append('.')
        sb.append(parts(i))
        i += 1
      }
      sb.toString
    }
    // -1 = no rule matched yet (0 is a REAL result: a 1-label
    // exception rule yields psLen = 0 and must not fall through)
    var psLen = -1
    // exceptions first (longest first), then longest exact/wildcard
    var k = c.maxMatch
    while (psLen < 0 && k >= 1) {
      if (n >= k && !c.exceptions(k).isEmpty &&
          c.exceptions(k).contains(lastK(k))) psLen = k - 1
      k -= 1
    }
    if (psLen < 0) {
      k = c.maxMatch
      while (psLen < 0 && k >= 2) {
        if (n >= k && ((!c.exact(k).isEmpty && c.exact(k).contains(lastK(k))) ||
            (!c.wildcard(k - 1).isEmpty && c.wildcard(k - 1).contains(lastK(k - 1)))))
          psLen = k
        k -= 1
      }
      if (psLen < 0) psLen = 1
    }
    if (n <= psLen) UTF8String.fromString(h)
    else UTF8String.fromString(lastK(psLen + 1))
  }
}

/** Native registered-domain (eTLD+1) expression — the codegen'd
  * replacement for the column-composed PSL chain. The column form's
  * ~30 conditional references melted janino when callers' derivation
  * trees inlined (SCALE.md r16), and the lambda-bound rescue ran the
  * whole chain interpreted at ~100 µs/row; this is one generated
  * static call over pre-compiled hash sets (~1-2 µs/row) that keeps
  * the enclosing stage codegen'd — the
  * [[graft.functions.LshProbe]] precedent. The column chain survives
  * as `Links.registeredDomainExpr`, the compositional reference the
  * spec asserts row-identity against. */
case class PslDomain(child: Expression, rules: PslCompiled)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"psl_domain needs a string host, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "psl_domain"
  override protected def nullSafeEval(host: Any): Any =
    PslDomainRuntime.registeredDomain(host.asInstanceOf[UTF8String], rules)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslRules", rules, classOf[PslCompiled].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.PslDomainRuntime.registeredDomain($h, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
