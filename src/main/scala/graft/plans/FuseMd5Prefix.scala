package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: fuse `CAST(conv(substring(md5(x), 1, 12|8), 16,
  * 10) AS BIGINT)` — the engine-portable hash formula every graft
  * operator (and its DuckDB oracle) is written in — into the single
  * native `Md5Prefix` node.
  *
  * The composed chain evaluates five interpreted expressions and
  * round-trips through a hex STRING per row; the fused node is one
  * digest and an integer fold, bit-identical by construction (the
  * oracle gate re-proves it on every query: with this rule injected,
  * all md5-derived results still hash-match the DuckDB replay of the
  * composed SQL formula). Injected via `GraftExtensions`, so plans
  * written against the PUBLIC composed form — including raw
  * `spark.sql(...)` — get the fused hash with no code change. Only
  * the exact (1, 12|8, 16, 10) literal shape rewrites; any other
  * conv/substring use is left alone. */
object FuseMd5Prefix extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c: Cast if c.dataType == LongType =>
      c.child match {
        case Conv(Substring(Md5(e), IntLit(1), IntLit(len)), IntLit(16), IntLit(10), _)
            if len == 12 || len == 8 =>
          NativeExprs.Md5Prefix(e, len)
        case _ => c
      }
  }
}
