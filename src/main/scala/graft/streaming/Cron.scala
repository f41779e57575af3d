package graft.streaming

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** The reference's `cron "<expr>" { … }` scheduled-execution operator
  * (`/root/reference/libtenzir/builtins/operators/every_cron.cpp`, the cron
  * twin of `every`) as a pure next-fire-time function plus a driver-side
  * scheduler that runs a body (typically a `Trigger.AvailableNow` ingest
  * pass) at each fire.
  *
  * Supports the classic 5-field expression `min hour dom mon dow` with `*`,
  * lists (`1,15`), ranges (`9-17`), and steps (`*&#47;5`, `10-30/10`); dow
  * 0 and 7 are both Sunday. Day-of-month and day-of-week combine as OR when
  * both are restricted (POSIX crontab semantics). All times UTC.
  *
  * `nextAfter` is a total, pure function so scheduling is unit-testable with
  * golden timestamps; `schedule` injects clock + sleeper for the same reason.
  */
object Cron {

  final case class Expr(min: Set[Int], hour: Set[Int], dom: Set[Int],
      mon: Set[Int], dow: Set[Int], domStar: Boolean, dowStar: Boolean)

  def parse(expr: String): Expr = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron: want 5 fields, got ${fields.length} in '$expr'")
    def f(s: String, lo: Int, hi: Int): Set[Int] = s.split(",").flatMap { part =>
      val (body, step) = part.split("/") match {
        case Array(b) => (b, 1)
        case Array(b, st) => (b, st.toInt)
        case _ => sys.error(s"cron: bad field part '$part'")
      }
      require(step >= 1, s"cron: bad step in '$part'")
      val (a, b) = body match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, if (step == 1) v else hi)
      }
      require(a >= lo && b <= hi && a <= b, s"cron: '$part' out of [$lo,$hi]")
      (a to b by step)
    }.toSet
    val dow = f(fields(4), 0, 7).map(d => if (d == 7) 0 else d) // 7 ≡ Sunday
    // Vixie rule: the star flag is set whenever the field STARTS with '*'
    // (so "*/2" on dom still intersects with a restricted dow, not OR)
    Expr(f(fields(0), 0, 59), f(fields(1), 0, 23), f(fields(2), 1, 31),
      f(fields(3), 1, 12), dow,
      domStar = fields(2).startsWith("*"), dowStar = fields(4).startsWith("*"))
  }

  /** Strictly-next fire time after `after` (UTC), or None if none within
    * 8 years (catches impossible specs like Feb 30; 8 years covers the worst
    * real gap — Feb 29 across a non-leap century year).
    */
  def nextAfter(e: Expr, after: Instant): Option[Instant] = {
    var t = ZonedDateTime.ofInstant(after, ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    val limit = t.plusYears(8)
    while (t.isBefore(limit)) {
      if (!e.mon(t.getMonthValue)) {
        t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
      } else if (!dayMatches(e, t)) {
        t = t.plusDays(1).withHour(0).withMinute(0)
      } else if (!e.hour(t.getHour)) {
        t = t.plusHours(1).withMinute(0)
      } else if (!e.min(t.getMinute)) {
        t = t.plusMinutes(1)
      } else return Some(t.toInstant)
    }
    None
  }

  private def dayMatches(e: Expr, t: ZonedDateTime): Boolean = {
    val domOk = e.dom(t.getDayOfMonth)
    val dowOk = e.dow(t.getDayOfWeek.getValue % 7) // java DoW: Mon=1..Sun=7 → Sun=0
    (e.domStar, e.dowStar) match {
      case (true, true) => true
      case (false, true) => domOk
      case (true, false) => dowOk
      case (false, false) => domOk || dowOk // POSIX: both restricted → OR
    }
  }

  def nextAfter(expr: String, after: Instant): Option[Instant] =
    nextAfter(parse(expr), after)

  /** Run `body` at each cron fire, `maxRuns` times. `clock`/`sleeper` are
    * injectable for tests; production use is the defaults — e.g.
    * `Cron.schedule("*&#47;5 * * * *", maxRuns = Int.MaxValue) { () => stream.processAllAvailable() }`
    * for a five-minute ingest cadence (the reference's `cron` wrapping an
    * `every`-style source pass).
    */
  def schedule(expr: String, maxRuns: Int,
      clock: () => Instant = () => Instant.now(),
      sleeper: Long => Unit = Thread.sleep)(body: Instant => Unit): Int = {
    val e = parse(expr)
    var runs = 0
    var now = clock()
    while (runs < maxRuns) {
      nextAfter(e, now) match {
        case None => return runs
        case Some(fire) =>
          val waitMs = fire.toEpochMilli - clock().toEpochMilli
          if (waitMs > 0) sleeper(waitMs)
          body(fire)
          runs += 1
          // re-sync to wall clock: a body slower than the cadence skips the
          // missed slots instead of firing a stale catch-up burst
          val after = clock()
          now = if (after.isAfter(fire)) after else fire
      }
    }
    runs
  }
}
