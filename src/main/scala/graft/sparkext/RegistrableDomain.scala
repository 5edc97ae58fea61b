package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A compiled public-suffix rule set, held as ONE reference object (the
  * [[BpeMergeTable]] rule: plan-node count independent of list size —
  * the real publicsuffix.org list is ~9k rules and would otherwise be
  * 9k literal AST nodes).
  *
  * Implements the PUBLISHED matching algorithm (publicsuffix.org/list,
  * the spec every browser cookie-scoper uses):
  *   - a rule is a dot-separated label list; `*` matches exactly one
  *     label; a leading `!` marks an EXCEPTION rule;
  *   - a rule matches a host when, label-by-label right-to-left, every
  *     rule label matches the host's corresponding label (the host may
  *     be longer);
  *   - among matching rules an exception wins outright (its public
  *     suffix is the rule minus its leftmost label); otherwise the rule
  *     with the most labels prevails; when nothing matches the
  *     prevailing rule is `*` (the bare TLD);
  *   - the public suffix is the prevailing labels of the host; the
  *     REGISTRABLE domain (eTLD+1) is the suffix plus one more host
  *     label — undefined (null here) when the host IS a public suffix.
  *
  * Scope boundaries, documented rather than guessed: inputs are
  * expected pre-extracted lowercase hostnames (use `Url.host`); IPv4
  * literals and single-label hosts have no registrable domain (null);
  * IDNs must already be in their canonical form (punycode or unicode —
  * the list and the host just have to agree, same contract as the spec). */
final class PublicSuffixRules(ruleLines: Seq[String]) extends Serializable {
  // rules keyed by last label: a host only ever meets rules sharing its TLD
  private val byTld: Map[String, Array[(Array[String], Boolean)]] = {
    val parsed = ruleLines.iterator
      .map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        val exception = l.startsWith("!")
        val labels = (if (exception) l.substring(1) else l).split('.')
        require(labels.nonEmpty && labels.forall(_.nonEmpty),
          s"malformed public-suffix rule '$l'")
        (labels, exception)
      }
      .toArray
    parsed.groupBy(_._1.last).map { case (k, v) => k -> v }
  }

  private def matches(rule: Array[String], host: Array[String]): Boolean = {
    if (rule.length > host.length) return false
    var i = 0
    while (i < rule.length) {
      val rl = rule(rule.length - 1 - i)
      val hl = host(host.length - 1 - i)
      if (rl != "*" && rl != hl) return false
      i += 1
    }
    true
  }

  /** Number of public-suffix labels of `host` (≥1 by the default-`*`
    * rule), or -1 when the host itself has no valid suffix shape. */
  private def suffixLabels(host: Array[String]): Int = {
    if (host.isEmpty || host.exists(_.isEmpty)) return -1
    val candidates = byTld.getOrElse(host.last, Array.empty)
    var best = 1 // the default rule "*"
    var i = 0
    while (i < candidates.length) {
      val (rule, exception) = candidates(i)
      if (matches(rule, host)) {
        if (exception) return rule.length - 1 // exception wins outright
        if (rule.length > best) best = rule.length
      }
      i += 1
    }
    best
  }

  /** eTLD+1 of a lowercase hostname, or null when undefined. */
  def registrable(hostRaw: UTF8String): UTF8String = {
    var h = hostRaw.toString.toLowerCase
    if (h.endsWith(".")) h = h.substring(0, h.length - 1) // FQDN trailing dot
    if (h.isEmpty) return null
    val labels = h.split('.')
    // IPv4 literal: no registrable domain (PSL scope boundary)
    if (labels.length == 4 && labels.forall(l => l.nonEmpty && l.forall(_.isDigit)))
      return null
    val ps = suffixLabels(labels)
    if (ps < 0 || labels.length <= ps) return null
    UTF8String.fromString(labels.takeRight(ps + 1).mkString("."))
  }

  /** The public suffix itself (for observability lanes), or null. */
  def publicSuffix(hostRaw: UTF8String): UTF8String = {
    var h = hostRaw.toString.toLowerCase
    if (h.endsWith(".")) h = h.substring(0, h.length - 1)
    if (h.isEmpty) return null
    val labels = h.split('.')
    if (labels.length == 4 && labels.forall(l => l.nonEmpty && l.forall(_.isDigit)))
      return null
    val ps = suffixLabels(labels)
    if (ps < 0 || labels.length < ps) return null
    UTF8String.fromString(labels.takeRight(ps).mkString("."))
  }
}

/** `string host -> string eTLD+1` (or the bare public suffix with
  * `suffixOnly = true`); null in, null out; null when undefined. Codegen
  * ships the rule set as a reference object and emits one call. */
case class RegistrableDomain(
    child: Expression,
    rules: Seq[String],
    suffixOnly: Boolean
) extends UnaryExpression {

  @transient private lazy val table = new PublicSuffixRules(rules)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    if (suffixOnly) table.publicSuffix(v.asInstanceOf[UTF8String])
    else table.registrable(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val t = ctx.addReferenceObj("pslRules", table, classOf[PublicSuffixRules].getName)
    val fn = if (suffixOnly) "publicSuffix" else "registrable"
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = $t.$fn($x);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
    copy(child = newChild)
  override def simpleString(maxFields: Int): String =
    s"registrable_domain(rules=${rules.size}, suffixOnly=$suffixOnly)"
  override def prettyName: String = "registrable_domain"
}

object RegistrableDomain {
  def apply(host: Column, rules: Seq[String], suffixOnly: Boolean = false): Column =
    ColumnBridge.column(RegistrableDomain(
      ColumnBridge.expression(host), rules, suffixOnly))
}
