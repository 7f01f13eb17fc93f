package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RegExpReplace, StringReplace, StringTrim}

/** Markup-to-text extraction — the step between a raw HTML crawl and
  * every text operator in the pipeline (CCNet/RefinedWeb run exactly this
  * shape before language ID, quality scoring, and dedup). Deliberately
  * composed from CODEGEN'D BUILT-INS (regexp_replace / replace / trim):
  * the whole extraction inlines into the scan's whole-stage codegen, and
  * the identical regex/replacement chain is replayable in the DuckDB
  * oracle — a tag-soup DOM parser would be neither.
  *
  * Built as a catalyst Expression tree (not `functions._` Columns) so ONE
  * definition serves both surfaces: the Column API wraps it via the
  * bridge, and the `graft_html_text` SQL builder embeds it directly — a
  * Column-node tree returned from a FunctionBuilder is Unevaluable
  * (ColumnNodeExpression never resolves on that path; measured, not
  * theorized).
  *
  * Policy (the boilerplate-stripping subset that is deterministic and
  * cross-engine stable):
  *  1. `<script>`/`<style>` elements are dropped WITH their content
  *     (code and CSS are not prose — leaving them in poisons quality
  *     scores and shingle tables);
  *  2. every remaining tag becomes one space (block boundaries must
  *     separate words: `<p>a</p><p>b</p>` reads "a b", never "ab");
  *  3. the five ubiquitous named entities + the numeric apostrophe are
  *     decoded, `&amp;` LAST so double-escaped text stays literal
  *     (`&amp;lt;` → `&lt;` the four-char string, exactly like a
  *     single-pass spec-compliant decoder);
  *  4. whitespace collapses to single spaces and is trimmed. The char
  *     class is explicit `[ \t\n\r]` — Java's `\s` includes U+000B,
  *     RE2's does not, and the oracle runs on RE2.
  *
  * Not attempted (documented non-goals): full entity tables, comments
  * `<!-- -->` with embedded tags, CDATA, conditional comments — the
  * corpus-doctored gate exercises the contract above, and a production
  * crawl would front a real HTML5 parser only for the DOM-dependent
  * parts (main-content extraction), which are out of scope here. */
object MarkupFunctions {

  /** amp LAST — see policy note 3. */
  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** The extraction chain as a catalyst tree over `child` — shared by the
    * Column API and the `graft_html_text` SQL registration. */
  private[graft] def htmlTextExpr(child: Expression): Expression = {
    // explicit whitespace class in the closing tag too (policy note 4):
    // Java's \s includes U+000B, RE2's does not — a vertical tab inside a
    // closing tag must not diverge engine vs oracle. \f stays IN the
    // class: both engines' \s match it, so dropping it would narrow the
    // block-strip beyond the \x0B parity fix (a form feed inside
    // </script > would leak the script body into the extracted text)
    val noBlocks = RegExpReplace(child,
      Literal("(?is)<(script|style)[^>]*>.*?</(script|style)[ \\t\\n\\f\\r]*>"), Literal(" "))
    val noTags = RegExpReplace(noBlocks, Literal("(?s)<[^>]*>"), Literal(" "))
    val decoded = Entities.foldLeft(noTags: Expression) { case (acc, (k, v)) =>
      StringReplace(acc, Literal(k), Literal(v))
    }
    StringTrim(RegExpReplace(decoded, Literal("[ \\t\\n\\r]+"), Literal(" ")))
  }

  /** Visible text of an HTML STRING column, per the policy above. */
  def htmlText(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(htmlTextExpr(expression(c)))
  }
}
