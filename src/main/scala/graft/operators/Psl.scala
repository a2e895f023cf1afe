package graft.operators

/** Public Suffix List support for [[Links.registeredDomain]].
  *
  * The PSL (publicsuffix.org) is the public data file every browser
  * and crawler uses to answer "where does the registrar's part of a
  * host end": exact rules (`co.uk`), wildcard rules (`*.ck` — every
  * direct child of ck is a public suffix) and exception rules
  * (`!www.ck` — www.ck is registrable despite the wildcard). The
  * matching algorithm (publicsuffix.org/list/, "Definitions"): among
  * all matching rules the prevailing rule is the exception if any
  * matches, else the LONGEST match, else the implicit `*` rule (the
  * bare TLD); the public suffix is the prevailing rule's labels
  * (minus one for an exception), and the registered domain is the
  * public suffix plus one label.
  *
  * A vendored snapshot ships at `graft/public_suffix_list.dat`
  * (the full 2023-02-09 distribution — see that file's header; its
  * date is parsed into [[Rules.snapshotDate]] and [[Default]] warns
  * on stderr once it ages past [[StaleAfterMonths]]); production
  * deploys drop the current full PSL at the same resource
  * path and every rule kind parses. When the resource is absent
  * entirely, [[Links.registeredDomain]] falls back to the
  * [[Links.DefaultMultiSuffixes]] two-level table (the pre-PSL
  * behavior), so the library never hard-fails on a stripped jar.
  *
  * Rules are label-count-bucketed string SETS, compiled into the
  * column expression as `isin` lists (Catalyst converts lists past
  * the InSet threshold into hash-set lookups — per-row cost is a
  * handful of hash probes, no join, no shuffle, broadcast implicitly
  * with the plan). That keeps `registeredDomain` a pure scalar
  * expression usable as a grouping key anywhere, which a
  * lookup-table JOIN version would not be. */
object Psl {

  /** Parsed rule set. `exact` and `exceptions` are keyed by the
    * rule's own label count; `wildcard` is keyed by the BASE label
    * count (the `X` of `*.X` — a wildcard asserts public suffixes of
    * length base+1). Single-label exact rules (bare TLDs — the full
    * PSL lists ~1500) are accepted but add nothing: the implicit `*`
    * default already yields psLen=1. */
  final case class Rules(
      exact: Map[Int, Set[String]],
      wildcard: Map[Int, Set[String]],
      exceptions: Map[Int, Set[String]],
      snapshotDate: Option[java.time.LocalDate] = None) {
    /** Longest public-suffix length (in labels) any rule can assert. */
    val maxMatch: Int =
      (exact.keys ++ wildcard.keys.map(_ + 1) ++ Seq(1)).max
    /** Hash-set form for the native [[graft.functions.PslDomain]]
      * expression (compiled once per rule set, shipped as one
      * reference object). */
    @transient lazy val compiled: graft.functions.PslCompiled =
      graft.functions.PslDomainRuntime.compile(exact, wildcard, exceptions)
    def nRules: Int =
      exact.valuesIterator.map(_.size).sum +
        wildcard.valuesIterator.map(_.size).sum +
        exceptions.valuesIterator.map(_.size).sum
  }

  /** Parse PSL-format lines: `//` comments and blanks skipped, the
    * rule is the token up to the first whitespace, lowercased (the
    * PSL's own convention; hosts are lowercased before matching).
    * Leading `!` = exception, leading `*.` = wildcard, else exact.
    * Wildcards anywhere but the leftmost label are not in the PSL
    * grammar and are rejected loudly (a silently-misparsed rule set
    * would mis-group domains corpus-wide).
    *
    * IDN rules (r16): the full PSL writes internationalized suffixes
    * in UNICODE (`中国`, `рф`, `გე`) while crawl hosts are PUNYCODE
    * (`xn--fiqs8s`) — a unicode-only rule would silently never match
    * and every site under that registry would over-group into the
    * bare IDN TLD. Non-ASCII rules therefore register BOTH forms
    * (unicode as written + `java.net.IDN.toASCII` per label); a
    * label the encoder rejects keeps only its written form. */
  def parse(lines: Iterator[String]): Rules = {
    val exact = scala.collection.mutable.Map[Int, Set[String]]()
    val wild = scala.collection.mutable.Map[Int, Set[String]]()
    val exc = scala.collection.mutable.Map[Int, Set[String]]()
    def add(m: scala.collection.mutable.Map[Int, Set[String]], s: String): Unit =
      forms(s).foreach { f =>
        val k = f.count(_ == '.') + 1
        m(k) = m.getOrElse(k, Set.empty) + f
      }
    def forms(s: String): Seq[String] =
      if (s.forall(_ < 128)) Seq(s)
      else Seq(s) ++ (try {
        val ascii = s.split('.')
          .map(l => java.net.IDN.toASCII(l).toLowerCase(java.util.Locale.ROOT))
          .mkString(".")
        if (ascii == s) Nil else Seq(ascii)
      } catch { case _: IllegalArgumentException => Nil })
    var snapDate: Option[java.time.LocalDate] = None
    for (raw <- lines) {
      val line = raw.trim.takeWhile(!_.isWhitespace)
      // Snapshot-date marker (r18, the r17 verdict's staleness ask):
      // scan header comments for a date so the rule set knows how old
      // its data is. Two shapes: our vendored header's "snapshot
      // dated YYYY-MM-DD" and a distribution "VERSION: YYYY-MM-DD…"
      // comment. An upstream master file carries neither — the date
      // stays None and [[Default]] warns that staleness is UNKNOWN.
      if (snapDate.isEmpty && raw.trim.startsWith("//")) {
        val m = SnapshotDateRe.findFirstMatchIn(raw)
        m.foreach(d => snapDate =
          try Some(java.time.LocalDate.parse(d.group(1)))
          catch { case _: java.time.format.DateTimeParseException => None })
      }
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase
        if (rule != "*") {
          // Classify first, then require the remaining BODY is star-free:
          // the grammar allows `*` only as the whole leftmost label, so
          // after stripping one `!` or one `*.` prefix any surviving `*`
          // (`!*.ck`, `*ck`, `a.*.b`) is a misparse and must refuse
          // loudly — a literal-`*` set entry would silently never match.
          val (bucket, body) =
            if (rule.startsWith("!")) (exc, rule.drop(1))
            else if (rule.startsWith("*.")) (wild, rule.drop(2))
            else (exact, rule)
          require(!body.contains("*"),
            s"PSL rule '$rule': wildcards are only defined at the leftmost label")
          add(bucket, body)
        }
      }
    }
    Rules(exact.toMap, wild.toMap, exc.toMap, snapDate)
  }

  private val SnapshotDateRe =
    """(?:snapshot dated|VERSION:)\s*(\d{4}-\d{2}-\d{2})""".r

  /** Age past which [[Default]] warns the snapshot needs a refresh.
    * The PSL gains registry suffixes continuously; past this age new
    * suffixes fall to the implicit `*` rule and curation mis-groups
    * those domains (q97/q134/q147-class operators). 18 months is the
    * PSL maintainers' own "refresh at least yearly" guidance plus
    * slack for release lag. */
  val StaleAfterMonths: Long = 18

  /** Load a PSL resource from the classpath; None when absent. */
  def load(resource: String = "/graft/public_suffix_list.dat"): Option[Rules] =
    Option(getClass.getResourceAsStream(resource)).map { in =>
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try parse(src.getLines()) finally src.close()
    }

  /** The vendored snapshot, parsed once per JVM. Aging is LOUD (r18):
    * a snapshot older than [[StaleAfterMonths]] — or one whose date
    * can't be read at all — logs a one-line stderr warning naming the
    * refresh step (drop the current publicsuffix.org file at the
    * resource path and update PslSpec's pinned date), so the data
    * can't silently age the way the 2023 snapshot did for 3 years. */
  lazy val Default: Option[Rules] = {
    val r = load()
    r.foreach { rules =>
      rules.snapshotDate match {
        case Some(d) =>
          val age = java.time.temporal.ChronoUnit.MONTHS
            .between(d, java.time.LocalDate.now())
          if (age >= StaleAfterMonths)
            System.err.println(s"[psl] vendored snapshot dated $d is " +
              s"$age months old — refresh: drop the current " +
              "publicsuffix.org public_suffix_list.dat at " +
              "graft/public_suffix_list.dat and update PslSpec's pinned date")
        case None =>
          System.err.println("[psl] snapshot carries no date marker — " +
            "staleness unknown; add a '// VERSION: YYYY-MM-DD' header line")
      }
    }
    r
  }
}
