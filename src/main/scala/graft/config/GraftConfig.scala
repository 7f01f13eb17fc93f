package graft.config

import scala.concurrent.duration.{Duration, FiniteDuration, MILLISECONDS}
import scala.util.Try

/** Immutable typed view over a parsed pipeline configuration.
  *
  * Plays the role of the reference's HOCON `Configuration` wrapper
  * (reference `core/src/main/scala/atiesh/utils/Configuration.scala:18-140`):
  * typed getters with defaults for string/int/long/boolean/duration/bytes/
  * lists plus nested sections. The reference delegates to typesafe-config;
  * that library is not on this classpath, so `ConfigParser` below implements
  * the HOCON subset the reference's own example configs actually use
  * (nested blocks, `k = v`, quoted/unquoted strings, numbers, booleans,
  * durations, `[a, b]` lists, `#`/`//` comments).
  */
final class GraftConfig(private val root: Map[String, Any], val path: String = "") {

  private def resolve(key: String): Option[Any] = {
    val parts = key.split('.')
    parts.foldLeft(Option[Any](root)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), p) => m.get(p)
      case _ => None
    }
  }

  def has(key: String): Boolean = resolve(key).isDefined

  def getSection(key: String): Option[GraftConfig] = resolve(key).collect {
    case m: Map[String @unchecked, Any @unchecked] =>
      new GraftConfig(m, if (path.isEmpty) key else s"$path.$key")
  }

  /** Child section names, in insertion order of the underlying map. */
  def sectionKeys: Seq[String] =
    root.collect { case (k, _: Map[_, _]) => k }.toSeq

  def keys: Seq[String] = root.keys.toSeq

  def getStringOpt(key: String): Option[String] = resolve(key).map {
    case s: String => s
    case other     => other.toString
  }
  def getString(key: String): String =
    getStringOpt(key).getOrElse(missing(key, "string"))
  def getString(key: String, default: String): String =
    getStringOpt(key).getOrElse(default)

  private def toIntExact(key: String)(l: Long): Int = {
    // silent .toInt truncation turns a mistyped 2^32 into 0 and
    // 5_000_000_000 into a wrong positive value — fail like typesafe-config
    require(l >= Int.MinValue && l <= Int.MaxValue,
      s"config value <$key> = $l is out of Int range")
    l.toInt
  }
  def getIntOpt(key: String): Option[Int] = getLongOpt(key).map(toIntExact(key))
  def getInt(key: String): Int =
    getLongOpt(key).map(toIntExact(key)).getOrElse(missing(key, "int"))
  def getInt(key: String, default: Int): Int = getIntOpt(key).getOrElse(default)

  def getLongOpt(key: String): Option[Long] = resolve(key).flatMap {
    case n: Long   => Some(n)
    case n: Int    => Some(n.toLong)
    case n: Double => Some(n.toLong)
    case s: String => Try(s.trim.toLong).toOption
    case _         => None
  }
  def getLong(key: String): Long = getLongOpt(key).getOrElse(missing(key, "long"))
  def getLong(key: String, default: Long): Long = getLongOpt(key).getOrElse(default)

  def getDoubleOpt(key: String): Option[Double] = resolve(key).flatMap {
    case n: Double => Some(n)
    case n: Long   => Some(n.toDouble)
    case n: Int    => Some(n.toDouble)
    case s: String => Try(s.trim.toDouble).toOption
    case _         => None
  }
  def getDouble(key: String, default: Double): Double =
    getDoubleOpt(key).getOrElse(default)

  def getBooleanOpt(key: String): Option[Boolean] = resolve(key).flatMap {
    case b: Boolean => Some(b)
    case s: String  => s.trim.toLowerCase match {
      case "true" | "yes" | "on"  => Some(true)
      case "false" | "no" | "off" => Some(false)
      case _ => None
    }
    case _ => None
  }
  def getBoolean(key: String, default: Boolean): Boolean =
    getBooleanOpt(key).getOrElse(default)

  /** Duration literals: `100ms`, `5s`, `2 seconds`, `1m`, `1h`, bare millis. */
  def getDurationOpt(key: String): Option[FiniteDuration] = resolve(key).flatMap {
    case n: Long   => Some(FiniteDuration(n, MILLISECONDS))
    case n: Int    => Some(FiniteDuration(n.toLong, MILLISECONDS))
    case s: String => GraftConfig.parseDuration(s)
    case _         => None
  }
  def getDuration(key: String, default: FiniteDuration): FiniteDuration =
    getDurationOpt(key).getOrElse(default)

  /** Byte-size literals: `512k`, `10m`, `1g`, `64kb`, bare bytes. */
  def getBytesOpt(key: String): Option[Long] = resolve(key).flatMap {
    case n: Long   => Some(n)
    case n: Int    => Some(n.toLong)
    case s: String => GraftConfig.parseBytes(s)
    case _         => None
  }
  def getBytes(key: String, default: Long): Long =
    getBytesOpt(key).getOrElse(default)

  def getStringList(key: String): Seq[String] = resolve(key) match {
    case Some(l: Seq[_]) => l.map(_.toString)
    case Some(s: String) => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    case _               => Seq.empty
  }

  private def missing(key: String, tpe: String): Nothing =
    throw new IllegalArgumentException(
      s"missing or mistyped config key <${if (path.isEmpty) key else s"$path.$key"}> (expected $tpe)")

  override def toString: String = s"GraftConfig($root)"
}

object GraftConfig {
  val empty = new GraftConfig(Map.empty)

  def parse(text: String): GraftConfig = new GraftConfig(ConfigParser.parse(text))

  def parseFile(file: String): GraftConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
                     java.nio.charset.StandardCharsets.UTF_8))

  private val durationRe = """^\s*(\d+)\s*([a-zA-Z]*)\s*$""".r
  def parseDuration(s: String): Option[FiniteDuration] = s match {
    case durationRe(n, unit) =>
      val ms = unit.toLowerCase match {
        case "" | "ms" | "millis" | "milliseconds" => Some(1L)
        case "s" | "sec" | "second" | "seconds"    => Some(1000L)
        case "m" | "min" | "minute" | "minutes"    => Some(60000L)
        case "h" | "hour" | "hours"                => Some(3600000L)
        case "d" | "day" | "days"                  => Some(86400000L)
        case _                                     => None
      }
      ms.map(m => FiniteDuration(n.toLong * m, MILLISECONDS))
    case _ => Try(Duration(s)).toOption.collect { case f: FiniteDuration => f }
  }

  private val bytesRe = """^\s*(\d+)\s*([a-zA-Z]*)\s*$""".r
  def parseBytes(s: String): Option[Long] = s match {
    case bytesRe(n, unit) =>
      val mult = unit.toLowerCase match {
        case "" | "b"        => Some(1L)
        case "k" | "kb" | "kib" => Some(1024L)
        case "m" | "mb" | "mib" => Some(1024L * 1024)
        case "g" | "gb" | "gib" => Some(1024L * 1024 * 1024)
        case _               => None
      }
      mult.map(n.toLong * _)
    case _ => None
  }
}

/** Minimal recursive-descent parser for the HOCON subset used by
  * Flume-style pipeline configs (see FIXTURES.md §2 for the grammar the
  * reference's own README exercises). Produces nested
  * `Map[String, Any]` where values are String | Long | Double | Boolean |
  * Seq[Any] | Map[String, Any]. Insertion order is preserved
  * (`ListMap`) so interceptor/sink declaration order is stable.
  */
object ConfigParser {
  import scala.collection.immutable.ListMap

  def parse(text: String): Map[String, Any] = {
    val p = new Parser(text)
    val m = p.parseObjectBody(topLevel = true)
    m
  }

  private final class Parser(s: String) {
    private var i = 0
    private def eof: Boolean = i >= s.length
    private def peek: Char = s.charAt(i)

    private def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c.isWhitespace) i += 1
        else if (c == '#') skipLine()
        else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') skipLine()
        else go = false
      }
    }
    private def skipLine(): Unit = { while (!eof && peek != '\n') i += 1 }

    def parseObjectBody(topLevel: Boolean): Map[String, Any] = {
      var m = ListMap.empty[String, Any]
      skipWs()
      while (!eof && peek != '}') {
        val key = parseKey()
        skipWs()
        if (!eof && (peek == '{')) {
          i += 1
          val child = parseObjectBody(topLevel = false)
          expect('}')
          // duplicate sections DEEP-merge (HOCON object merge semantics —
          // a shallow merge would let a later `graft { source { s2 … } }`
          // wholesale replace an earlier sibling's s1); dotted keys nest
          m = mergeEntry(m, key, child)
        } else {
          if (!eof && (peek == '=' || peek == ':')) i += 1
          skipWs()
          val value = parseValue()
          m = mergeEntry(m, key, value)
        }
        skipWs()
        if (!eof && peek == ',') { i += 1; skipWs() }
      }
      m
    }

    private def parseKey(): String = {
      skipWs()
      if (!eof && peek == '"') parseQuoted()
      else {
        val start = i
        while (!eof && !peek.isWhitespace && peek != '=' && peek != ':' && peek != '{') i += 1
        s.substring(start, i)
      }
    }

    /** Store `key -> value` into `m`: dotted keys nest (every getter
      * resolves by splitting on '.', so a verbatim `a.b` entry would be
      * unreachable), and map-vs-map collisions deep-merge. */
    private def mergeEntry(m: scala.collection.immutable.ListMap[String, Any],
                           key: String, value: Any)
        : scala.collection.immutable.ListMap[String, Any] = {
      val parts = key.split('.').toSeq.filter(_.nonEmpty)
      def nest(ps: Seq[String], v: Any): Any =
        if (ps.isEmpty) v
        else scala.collection.immutable.ListMap(ps.head -> nest(ps.tail, v))
      val (k0, v0) =
        if (parts.length <= 1) (key, value)
        else (parts.head, nest(parts.tail, value))
      m.updated(k0, m.get(k0).map(deepMerge(_, v0)).getOrElse(v0))
    }

    private def deepMerge(a: Any, b: Any): Any = (a, b) match {
      case (am: Map[String @unchecked, Any @unchecked],
            bm: Map[String @unchecked, Any @unchecked]) =>
        bm.foldLeft(am) { case (acc, (k, v)) =>
          acc.updated(k, acc.get(k).map(deepMerge(_, v)).getOrElse(v))
        }
      case (_, newer) => newer // scalars: last one wins, as in HOCON
    }

    private def parseQuoted(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s.charAt(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
        } else sb.append(peek)
        i += 1
      }
      expect('"')
      sb.toString
    }

    private def parseValue(): Any = {
      skipWs()
      if (eof) ""
      else peek match {
        case '"' => parseQuoted()
        case '[' =>
          i += 1
          var items = List.empty[Any]
          skipWs()
          while (!eof && peek != ']') {
            items = parseValue() :: items
            skipWs()
            if (!eof && peek == ',') { i += 1; skipWs() }
          }
          expect(']')
          items.reverse
        case '{' =>
          i += 1
          val child = parseObjectBody(topLevel = false)
          expect('}')
          child
        case _ =>
          val start = i
          while (!eof && peek != '\n' && peek != ',' && peek != ']' && peek != '}' && peek != '#') i += 1
          val line = s.substring(start, i)
          // an inline `// comment` after an unquoted value is not part of
          // the value — but only when preceded by whitespace, so unquoted
          // `http://x` URLs survive (quoted values never reach this path)
          val cut = line.indexOf(" //")
          val raw = (if (cut >= 0) line.substring(0, cut) else line).trim
          coerce(raw)
      }
    }

    private def coerce(raw: String): Any = raw match {
      case "true"  => true
      case "false" => false
      case r if r.matches("""[-+]?\d+""")            => r.toLong
      case r if r.matches("""[-+]?\d*\.\d+([eE][-+]?\d+)?""") => r.toDouble
      case r => r
    }

    private def expect(c: Char): Unit = {
      if (eof || peek != c)
        throw new IllegalArgumentException(
          s"config parse error at offset $i: expected '$c'" +
          (if (eof) " but hit end of input" else s" but found '${peek}'"))
      i += 1
    }
  }
}
