package graft.interceptor

import graft.config.GraftConfig
import graft.event.Event

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Per-event map-or-drop transform — the engine's projection/filter/scalar
  * layer, mirroring the reference interceptor contract
  * (reference `core/src/main/scala/atiesh/interceptor/Interceptor.scala:75-94`):
  * one event in, one event or a discard out.
  *
  * Differences from the reference, by design:
  *  - discard is `None` (the reference returns the `Empty` sentinel);
  *  - an interceptor may additionally offer a **columnar** form
  *    (`columnar: DataFrame => DataFrame` over the `Event.schema` shape).
  *    When every interceptor in a chain provides one, the chain compiles to
  *    native Catalyst expressions — whole-stage-codegen'd, filter-pushdown
  *    eligible — instead of a deserializing `flatMap`. This is the
  *    Spark-first path; the typed fold below is the fully-general fallback
  *    for arbitrary user code.
  */
trait Interceptor extends Serializable {
  def name: String
  /** Higher priority runs first (reference sorts `-getPriority`,
    * `Interceptor.scala:49` via the companion loader). */
  def priority: Int = 50
  def intercept(event: Event): Option[Event]
  /** Catalyst-native equivalent over a DataFrame with `Event.schema`
    * columns (`body`, `headers`); None if this interceptor can only run as
    * typed Scala code. */
  def columnar: Option[DataFrame => DataFrame] = None
}

/** Identity pass-through (reference
  * `core/src/main/scala/atiesh/interceptor/Transparent.scala:17-25`). */
final case class Transparent(name: String, override val priority: Int = 50)
    extends Interceptor {
  def intercept(event: Event): Option[Event] = Some(event)
  override def columnar: Option[DataFrame => DataFrame] = Some(identity)
}

/** Drops every event (reference
  * `core/src/main/scala/atiesh/interceptor/DevNull.scala:17-28`). */
final case class DevNull(name: String, override val priority: Int = 50)
    extends Interceptor {
  def intercept(event: Event): Option[Event] = None
  override def columnar: Option[DataFrame => DataFrame] =
    Some(df => df.where(org.apache.spark.sql.functions.lit(false)))
}

/** Keeps events whose body matches `pattern` (regex find). */
final case class RegexFilter(name: String, pattern: String,
                             override val priority: Int = 50)
    extends Interceptor {
  /** Config-injected form: `{ fqcn = ..., pattern = "...", priority = N }`. */
  def this(name: String, priority: Int, cfg: graft.config.GraftConfig) =
    this(name, cfg.getString("pattern"), priority)
  @transient private lazy val re = pattern.r
  def intercept(event: Event): Option[Event] =
    if (re.findFirstIn(event.body).isDefined) Some(event) else None
  override def columnar: Option[DataFrame => DataFrame] = Some { df =>
    import org.apache.spark.sql.functions._
    df.where(regexp_like(col("body"), lit(pattern)))
  }
}

/** Adds/overwrites static headers on every event. */
final case class HeaderEnrich(name: String, pairs: Map[String, String],
                              override val priority: Int = 50)
    extends Interceptor {
  /** Config-injected form: `{ fqcn = ..., headers { k = v, ... } }`. */
  def this(name: String, priority: Int, cfg: graft.config.GraftConfig) =
    this(name, cfg.getSection("headers")
      .map(h => h.keys.map(k => k -> h.getString(k)).toMap)
      .getOrElse(Map.empty), priority)
  def intercept(event: Event): Option[Event] = Some(event.withHeaders(pairs.toSeq: _*))
  override def columnar: Option[DataFrame => DataFrame] = Some { df =>
    import org.apache.spark.sql.functions._
    // empty enrichment is the identity — map() with zero args types as
    // MAP<VOID,VOID> and map_concat with the MAP<STRING,STRING> headers
    // column would fail analysis (the typed path is a no-op here too)
    if (pairs.isEmpty) df
    else {
      val add = map(pairs.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      df.withColumn("headers", map_concat(
        map_filter(col("headers"), (k, _) => !k.isin(pairs.keys.toSeq.map(lit): _*)), add))
    }
  }
}

/** An ordered interceptor chain with the reference's exact fold semantics
  * (reference `core/src/main/scala/atiesh/source/Source.scala:306-334`):
  *  - interceptors sorted by priority, highest first;
  *  - a discard (`None`) short-circuits the rest of the chain;
  *  - an interceptor throwing is **fail-open**: the event as it stood
  *    *before* that interceptor continues down the chain.
  */
final case class InterceptorChain(interceptors: Seq[Interceptor]) extends Serializable {
  val ordered: Seq[Interceptor] = interceptors.sortBy(-_.priority)

  /** Single-event fold (the reference's `intercept`, verbatim semantics). */
  def interceptOne(event: Event): Option[Event] =
    ordered.foldLeft(Option(event)) {
      case (None, _) => None
      case (Some(e), itp) =>
        try itp.intercept(e)
        catch { case _: Throwable => Some(e) } // fail-open: pass original
    }

  /** Compile the chain onto a Dataset. Uses the columnar composition when
    * every member provides one (keeps Catalyst pushdown + codegen); falls
    * back to one fused typed flatMap otherwise (a single (de)serialization
    * boundary for the whole chain, not one per interceptor). */
  def apply(ds: Dataset[Event]): Dataset[Event] = {
    val columnarForms = ordered.flatMap(_.columnar)
    if (columnarForms.length == ordered.length) {
      implicit val enc = Encoders.product[Event]
      columnarForms.foldLeft(ds.toDF())((df, f) => f(df)).as[Event]
    } else {
      implicit val enc = Encoders.product[Event]
      ds.flatMap(e => interceptOne(e))
    }
  }
}

object InterceptorChain {
  val empty: InterceptorChain = InterceptorChain(Seq.empty)

  /** Build the named interceptors from a config root, FQCN-loaded —
    * reference plugin surface parity (`Interceptor.scala:51-69`,
    * `ComponentLoader.scala:7-20`). Each section:
    * `graft.interceptor.<name> { fqcn = ..., priority = ... }`. */
  def fromConfig(root: GraftConfig, names: Seq[String]): InterceptorChain = {
    val section = root.getSection("graft.interceptor")
      .orElse(root.getSection("interceptor"))
      .getOrElse(GraftConfig.empty)
    InterceptorChain(names.map { n =>
      val cfg = section.getSection(n).getOrElse(
        throw new IllegalArgumentException(s"undeclared interceptor <$n>"))
      ComponentLoader.createInterceptor(n, cfg)
    })
  }
}

/** Reflective FQCN component loading — the reference's UDF surface
  * (reference `core/src/main/scala/atiesh/utils/ComponentLoader.scala:7-20`):
  * config names a class, we instantiate it with positional constructor
  * injection `(name: String, priority: Int, cfg: GraftConfig)` with
  * fallbacks for shorter signatures.
  */
object ComponentLoader {
  def createInterceptor(name: String, cfg: GraftConfig): Interceptor = {
    val fqcn = cfg.getString("fqcn", classOf[Transparent].getName)
    val priority = cfg.getInt("priority", 50)
    createInstance[Interceptor](fqcn,
      Seq(Seq[AnyRef](name, Int.box(priority), cfg),
          Seq[AnyRef](name, Int.box(priority)),
          Seq[AnyRef](name, cfg),
          Seq[AnyRef](name)))
  }

  /** Reflective plugin construction for sources/sinks (reference loads all
    * component types this way, not only interceptors): constructor
    * injection `(cfg: GraftConfig)` with a no-arg fallback. */
  def createPlugin[T](fqcn: String, cfg: GraftConfig): T =
    createInstance[T](fqcn, Seq(Seq[AnyRef](cfg), Seq.empty[AnyRef]))

  /** Try each candidate arg list against the class's constructors. */
  def createInstance[T](fqcn: String, candidates: Seq[Seq[AnyRef]]): T = {
    val cls = Class.forName(fqcn)
    val ctors = cls.getConstructors
    candidates.view.flatMap { args =>
      ctors.find { c =>
        val pts = c.getParameterTypes
        pts.length == args.length && pts.zip(args).forall { case (pt, a) =>
          pt.isInstance(a) || (pt == classOf[Int] && a.isInstanceOf[Integer])
        }
      }.map(c => c.newInstance(args: _*).asInstanceOf[T])
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"no usable constructor on $fqcn for injected args"))
  }
}
