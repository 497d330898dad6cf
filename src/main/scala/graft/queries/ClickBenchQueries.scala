package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ClickBench battery — all 43 web-analytics queries the reference
  * ships (tools/clickbench-tools/sql/queries.sql, run by
  * tools/clickbench-tools/run-clickbench-queries.sh over the `hits`
  * table) re-expressed onto the `events` fixture.
  *
  * Fixture mapping: the 100+-column `hits` fact is derived as a
  * portable inline view over `events` (the CTE below, shared verbatim
  * by both engines). Dimensions that ClickBench reads from dedicated
  * columns are deterministic integer projections of (event_id,
  * user_id, value, event_type); URL/Title/Referer/SearchPhrase are
  * concat-built strings so the LIKE / regexp_extract / MIN(string)
  * shapes stay faithful. EventTime is truncated to seconds in the view
  * (the raw fixture carries sub-microsecond ns the two engines load at
  * different precision) and cast to STRING whenever it is output.
  *
  * Portability re-expressions (same policy as the TPC-DS battery):
  * AVG is spelled exact-SUM/COUNT so both engines emit bit-identical
  * doubles; every ORDER BY gets a total-order tiebreaker; `%Y-%m-%d
  * %H:%i:00` minute bucketing becomes date_trunc('minute', ...);
  * REGEXP_REPLACE-with-backreference domain extraction becomes
  * regexp_extract (group 1); the google/not-.google. LIKE selectors
  * become the event-type tokens embedded in the generated URLs; the
  * two unordered GROUP BY ... LIMIT queries (Q17) gain a key ORDER BY;
  * OFFSET constants are scaled to the fixture cardinalities (so every
  * paged query still returns rows at sf0.01) keeping the
  * page-past-the-head shape.
  */
object ClickBenchQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  /** Portable hits view: identical text evaluated by Spark and DuckDB. */
  private val HITS = """
    WITH hits AS (
      SELECT
        event_id                                    AS WatchID,
        CAST(ts AS DATE)                            AS EventDate,
        date_trunc('second', ts)                    AS EventTime,
        user_id                                     AS UserID,
        CAST(event_id % 19 AS INT)                  AS AdvEngineID,
        CAST(user_id % 13 AS INT)                   AS RegionID,
        CAST(floor(value * 10) AS INT)              AS ResolutionWidth,
        CAST((event_id * 7919) % 100000 AS INT)     AS ClientIP,
        CAST(user_id % 3 AS INT)                    AS CounterID,
        CAST(event_id % 2 AS INT)                   AS IsRefresh,
        CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END AS DontCountHits,
        CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END AS IsLink,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS IsDownload,
        CAST(event_id % 7 - 1 AS INT)               AS TraficSourceID,
        CAST(user_id % 23 AS INT)                   AS SearchEngineID,
        CASE WHEN event_id % 4 = 0 THEN ''
             ELSE concat('phrase ', CAST(user_id % 40 AS STRING)) END AS SearchPhrase,
        CAST(user_id % 3 AS INT)                    AS MobilePhone,
        CASE WHEN user_id % 5 = 0 THEN ''
             ELSE concat('model-', CAST(user_id % 7 AS STRING)) END AS MobilePhoneModel,
        concat('https://site-', CAST(user_id % 29 AS STRING), '.example.com/',
               event_type, '/', CAST(event_id % 101 AS STRING)) AS URL,
        CASE WHEN event_id % 3 = 0 THEN ''
             ELSE concat('Title ', event_type, ' ', CAST(event_id % 53 AS STRING)) END AS Title,
        CASE WHEN event_id % 2 = 0 THEN ''
             ELSE concat('https://ref-', CAST(event_id % 31 AS STRING),
                         '.example.org/r/', CAST(user_id AS STRING)) END AS Referer,
        CAST(event_id % 13 AS BIGINT)               AS URLHash,
        CAST(event_id % 11 AS BIGINT)               AS RefererHash,
        CAST(floor(value * 13) AS INT)              AS WindowClientWidth,
        CAST(floor(value * 7) AS INT)               AS WindowClientHeight
      FROM events
    )"""

  // exact AVG spelling: both engines sum exact BIGINTs then divide once
  private def avg(col: String) =
    s"CAST(SUM(CAST($col AS BIGINT)) AS DOUBLE) / COUNT(*)"

  // Q29: SUM(ResolutionWidth + 0..89) — the codegen-width stress query
  private val q29sums =
    (0 to 89).map(k => s"CAST(SUM(ResolutionWidth + $k) AS BIGINT) AS r$k").mkString(", ")

  private val bothEngines: Map[String, String] = Map(

    // Q0: full-scan count
    "cb_q00" -> s"$HITS SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits",

    // Q1: filtered count
    "cb_q01" -> s"$HITS SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits WHERE AdvEngineID <> 0",

    // Q2: sum + count + avg in one pass
    "cb_q02" -> s"""$HITS
      SELECT CAST(SUM(AdvEngineID) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c,
             ${avg("ResolutionWidth")} AS a
      FROM hits""",

    // Q3: avg of a key column
    "cb_q03" -> s"$HITS SELECT ${avg("UserID")} AS a FROM hits",

    // Q4: exact distinct users
    "cb_q04" -> s"$HITS SELECT CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u FROM hits",

    // Q5: exact distinct phrases
    "cb_q05" -> s"$HITS SELECT CAST(COUNT(DISTINCT SearchPhrase) AS BIGINT) AS p FROM hits",

    // Q6: min/max date (string-cast: date loaders differ)
    "cb_q06" -> s"""$HITS
      SELECT CAST(MIN(EventDate) AS STRING) AS dmin, CAST(MAX(EventDate) AS STRING) AS dmax
      FROM hits""",

    // Q7: group on low-cardinality int, order by count
    "cb_q07" -> s"""$HITS
      SELECT AdvEngineID, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits WHERE AdvEngineID <> 0
      GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID""",

    // Q8: distinct users per region, top 10
    "cb_q08" -> s"""$HITS
      SELECT RegionID, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10""",

    // Q9: wide agg per region (sum/count/avg/distinct), top 10
    "cb_q09" -> s"""$HITS
      SELECT RegionID, CAST(SUM(AdvEngineID) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c,
             ${avg("ResolutionWidth")} AS a, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10""",

    // Q10: non-empty selector + distinct count, top 10
    "cb_q10" -> s"""$HITS
      SELECT MobilePhoneModel, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits WHERE MobilePhoneModel <> ''
      GROUP BY MobilePhoneModel ORDER BY u DESC, MobilePhoneModel LIMIT 10""",

    // Q11: two-key group + distinct count, top 10
    "cb_q11" -> s"""$HITS
      SELECT MobilePhone, MobilePhoneModel, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits WHERE MobilePhoneModel <> ''
      GROUP BY MobilePhone, MobilePhoneModel
      ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10""",

    // Q12: top phrases by hits
    "cb_q12" -> s"""$HITS
      SELECT SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits WHERE SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10""",

    // Q13: top phrases by distinct users
    "cb_q13" -> s"""$HITS
      SELECT SearchPhrase, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits WHERE SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY u DESC, SearchPhrase LIMIT 10""",

    // Q14: engine x phrase, top 10
    "cb_q14" -> s"""$HITS
      SELECT SearchEngineID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits WHERE SearchPhrase <> ''
      GROUP BY SearchEngineID, SearchPhrase
      ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10""",

    // Q15: heavy-hitter users
    "cb_q15" -> s"""$HITS
      SELECT UserID, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY UserID ORDER BY c DESC, UserID LIMIT 10""",

    // Q16: user x phrase, ordered top 10
    "cb_q16" -> s"""$HITS
      SELECT UserID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY UserID, SearchPhrase
      ORDER BY c DESC, UserID, SearchPhrase LIMIT 10""",

    // Q17: user x phrase, any-10 page (key-ordered for portability)
    "cb_q17" -> s"""$HITS
      SELECT UserID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY UserID, SearchPhrase
      ORDER BY UserID, SearchPhrase LIMIT 10""",

    // Q18: user x minute x phrase
    "cb_q18" -> s"""$HITS
      SELECT UserID, CAST(extract(minute FROM EventTime) AS BIGINT) AS m, SearchPhrase,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY UserID, extract(minute FROM EventTime), SearchPhrase
      ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10""",

    // Q19: key point lookup
    "cb_q19" -> s"$HITS SELECT UserID FROM hits WHERE UserID = 42",

    // Q20: LIKE scan count ('%google%' -> the token embedded in URLs)
    "cb_q20" -> s"$HITS SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits WHERE URL LIKE '%click%'",

    // Q21: LIKE + min(url) per phrase
    "cb_q21" -> s"""$HITS
      SELECT SearchPhrase, MIN(URL) AS murl, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits WHERE URL LIKE '%click%' AND SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10""",

    // Q22: two LIKEs + NOT LIKE + two mins + distinct users
    "cb_q22" -> s"""$HITS
      SELECT SearchPhrase, MIN(URL) AS murl, MIN(Title) AS mtitle,
             CAST(COUNT(*) AS BIGINT) AS c, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
      FROM hits
      WHERE Title LIKE '%view%' AND URL NOT LIKE '%/view/%' AND SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10""",

    // Q23: SELECT * + LIKE + time order (explicit projection; ts string-cast)
    "cb_q23" -> s"""$HITS
      SELECT WatchID, CAST(EventDate AS STRING) AS EventDate,
             CAST(EventTime AS STRING) AS EventTime, UserID, AdvEngineID, RegionID,
             ResolutionWidth, ClientIP, CounterID, IsRefresh, DontCountHits, IsLink,
             IsDownload, TraficSourceID, SearchEngineID, SearchPhrase, MobilePhone,
             MobilePhoneModel, URL, Title, Referer, URLHash, RefererHash,
             WindowClientWidth, WindowClientHeight
      FROM hits WHERE URL LIKE '%click%'
      ORDER BY EventTime, WatchID LIMIT 10""",

    // Q24: projection + time order
    "cb_q24" -> s"""$HITS
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY EventTime, WatchID LIMIT 10""",

    // Q25: projection + value order
    "cb_q25" -> s"""$HITS
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY SearchPhrase, WatchID LIMIT 10""",

    // Q26: projection + composite order
    "cb_q26" -> s"""$HITS
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10""",

    // Q27: avg(length) + HAVING count threshold (scaled 100000 -> 100)
    "cb_q27" -> s"""$HITS
      SELECT CounterID, ${avg("length(URL)")} AS l, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits WHERE URL <> ''
      GROUP BY CounterID HAVING COUNT(*) > 100
      ORDER BY l DESC, CounterID LIMIT 25""",

    // Q28: referrer-domain extraction (regexp_extract replaces the
    // backreference REGEXP_REPLACE — engines disagree on \1 vs $1)
    "cb_q28" -> s"""$HITS
      SELECT regexp_extract(Referer, 'https?://([^/]+)/', 1) AS k,
             ${avg("length(Referer)")} AS l, CAST(COUNT(*) AS BIGINT) AS c,
             MIN(Referer) AS mref
      FROM hits WHERE Referer <> ''
      GROUP BY regexp_extract(Referer, 'https?://([^/]+)/', 1)
      HAVING COUNT(*) > 100
      ORDER BY l DESC, k LIMIT 25""",

    // Q29: the 90-sum single-pass scan (codegen width stress)
    "cb_q29" -> s"$HITS SELECT $q29sums FROM hits",

    // Q30: engine x ip, filtered
    "cb_q30" -> s"""$HITS
      SELECT SearchEngineID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(IsRefresh) AS BIGINT) AS refr, ${avg("ResolutionWidth")} AS a
      FROM hits WHERE SearchPhrase <> ''
      GROUP BY SearchEngineID, ClientIP
      ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10""",

    // Q31: watch x ip, filtered (near-unique keys)
    "cb_q31" -> s"""$HITS
      SELECT WatchID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(IsRefresh) AS BIGINT) AS refr, ${avg("ResolutionWidth")} AS a
      FROM hits WHERE SearchPhrase <> ''
      GROUP BY WatchID, ClientIP
      ORDER BY c DESC, WatchID, ClientIP LIMIT 10""",

    // Q32: watch x ip, unfiltered — the full-cardinality group-by
    "cb_q32" -> s"""$HITS
      SELECT WatchID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(IsRefresh) AS BIGINT) AS refr, ${avg("ResolutionWidth")} AS a
      FROM hits GROUP BY WatchID, ClientIP
      ORDER BY c DESC, WatchID, ClientIP LIMIT 10""",

    // Q33: top URLs
    "cb_q33" -> s"""$HITS
      SELECT URL, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY URL ORDER BY c DESC, URL LIMIT 10""",

    // Q34: constant + URL group
    "cb_q34" -> s"""$HITS
      SELECT 1 AS one, URL, CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY 1, URL ORDER BY c DESC, URL LIMIT 10""",

    // Q35: derived-key group (ip, ip-1, ip-2, ip-3)
    "cb_q35" -> s"""$HITS
      SELECT ClientIP, ClientIP - 1 AS ip1, ClientIP - 2 AS ip2, ClientIP - 3 AS ip3,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM hits GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3
      ORDER BY c DESC, ClientIP LIMIT 10""",

    // Q36: dashboard page-views slice (counter + date window + flags)
    "cb_q36" -> s"""$HITS
      SELECT URL, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND DontCountHits = 0 AND IsRefresh = 0 AND URL <> ''
      GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10""",

    // Q37: same slice over titles
    "cb_q37" -> s"""$HITS
      SELECT Title, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND DontCountHits = 0 AND IsRefresh = 0 AND Title <> ''
      GROUP BY Title ORDER BY PageViews DESC, Title LIMIT 10""",

    // Q38: link-only slice, paged past the head (OFFSET 1000 -> 20)
    "cb_q38" -> s"""$HITS
      SELECT URL, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND IsRefresh = 0 AND IsLink <> 0 AND IsDownload = 0
      GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 20""",

    // Q39: traffic-source breakdown with CASE source column (OFFSET 1000 -> 100)
    "cb_q39" -> s"""$HITS
      SELECT TraficSourceID, SearchEngineID, AdvEngineID,
             CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END AS Src,
             URL AS Dst, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND IsRefresh = 0
      GROUP BY TraficSourceID, SearchEngineID, AdvEngineID,
               CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END,
               URL
      ORDER BY PageViews DESC, TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
      LIMIT 10 OFFSET 100""",

    // Q40: url-hash daily drill-down (IN list + point hash; OFFSET 100 -> 2)
    "cb_q40" -> s"""$HITS
      SELECT URLHash, CAST(EventDate AS STRING) AS EventDate, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND IsRefresh = 0 AND TraficSourceID IN (-1, 5) AND RefererHash = 7
      GROUP BY URLHash, EventDate
      ORDER BY PageViews DESC, URLHash, EventDate LIMIT 10 OFFSET 2""",

    // Q41: viewport histogram for one url-hash (OFFSET 10000 -> 10)
    "cb_q41" -> s"""$HITS
      SELECT WindowClientWidth, WindowClientHeight, CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-03' AND EventDate <= '2024-01-09'
        AND IsRefresh = 0 AND DontCountHits = 0 AND URLHash = 7
      GROUP BY WindowClientWidth, WindowClientHeight
      ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight LIMIT 10 OFFSET 10""",

    // Q42: per-minute page-view series (DATE_FORMAT minute bucket ->
    // date_trunc; OFFSET 1000 -> 40)
    "cb_q42" -> s"""$HITS
      SELECT CAST(date_trunc('minute', EventTime) AS STRING) AS M,
             CAST(COUNT(*) AS BIGINT) AS PageViews
      FROM hits
      WHERE CounterID = 1 AND EventDate >= '2024-01-05' AND EventDate <= '2024-01-06'
        AND IsRefresh = 0 AND DontCountHits = 0
      GROUP BY date_trunc('minute', EventTime)
      ORDER BY M LIMIT 10 OFFSET 40"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  val oracle: Map[String, String] = bothEngines
}
