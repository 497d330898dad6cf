package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real-dataset suite battery — representative queries from the three
  * reference regression suites not already covered by a benchmark
  * battery (ClickBench covers yandex_metrica_p2):
  *
  *   - brown_p2 (the mgbench machine/sensor-log suite):
  *     regression-test/suites/brown_p2/sql/{CPUNetworkUtilization_order,
  *     temperatureVariation_order,dailyUV,hourlyNetworkTraffic,
  *     offlineMachine,excessiveRequests}.sql
  *   - github_events_p2 (the GitHub archive suite):
  *     .../github_events_p2/sql/{affinityByIssuesAndPRs1,
  *     howHasTheListOfTopRepositoriesChangedOverTheYears1,
  *     howHasTheTotalNumberOfStarsChangedOverTime,
  *     proportionsBetweenStarsAndForks1,issuesWithTheMostComments1,
  *     organizationsByTheNumberOfStars}.sql
  *   - opensky_p2 (the flight-trajectory suite):
  *     .../opensky_p2/sql/{avgDistance,totalDistance,mostBusyOrigin}.sql
  *
  * Fixture mapping: all three facts derive from `events` via portable
  * inline CTEs (same policy as the ClickBench battery) — machines /
  * repos / airports are deterministic string projections of user_id,
  * metrics are exact-integer projections of value (floor-scaled so both
  * engines aggregate exact BIGINTs), NULL metrics (the mgbench
  * load_one-IS-NULL shape) appear on the 'error' event rows.
  * st_distance_sphere is spelled as an explicit haversine (the oracle
  * engine has no geo functions); per-row distances round to integer
  * meters before summing so cross-engine trig ulp noise cannot reach
  * the aggregate.
  */
object RealDataQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  /** mgbench logs: machine telemetry derived from events. */
  private val LOGS = """
    WITH logs AS (
      SELECT
        concat('mach-', CAST(user_id % 20 AS STRING)) AS machine_name,
        date_trunc('second', ts)                      AS log_time,
        CAST(ts AS DATE)                              AS dt,
        CAST(extract(hour FROM ts) AS INT)            AS hr,
        concat('dev-', CAST(user_id % 12 AS STRING))  AS device_name,
        event_type                                    AS device_type,
        CAST(user_id % 4 AS INT)                      AS device_floor,
        CASE WHEN event_type = 'error' THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(value * 7) AS BIGINT) END    AS cpu_user,
        CASE WHEN event_type = 'error' THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(value * 1000) AS BIGINT) END AS bytes_in,
        CASE WHEN event_type = 'error' THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(value * 800) AS BIGINT) END  AS bytes_out,
        CAST(floor(value * 7) AS BIGINT)              AS metric,
        concat('ip-', CAST(user_id % 43 AS STRING))   AS client_ip
      FROM events
    )"""

  /** github_events: archive events derived from events (click=star,
    * purchase=fork, view=PR-opened, error=issue comment). */
  private val GH = """
    WITH gh AS (
      SELECT
        concat('org-', CAST(event_id % 7 AS STRING),
               '/repo-', CAST(event_id % 37 AS STRING)) AS repo_name,
        concat('u', CAST(user_id AS STRING))           AS actor_login,
        event_type,
        ts                                             AS created_at,
        CAST(event_id % 211 AS INT)                    AS issue_number
      FROM events
    )"""

  /** opensky: flight segments with derived endpoint coordinates. */
  private val SKY = """
    WITH opensky AS (
      SELECT
        concat('AP', CAST(user_id % 40 AS STRING))      AS origin,
        CAST((user_id % 360) - 180 AS DOUBLE) + 0.5     AS longitude_1,
        CAST((user_id % 170) - 85 AS DOUBLE) + 0.25     AS latitude_1,
        CAST((event_id % 360) - 180 AS DOUBLE) + 0.5    AS longitude_2,
        CAST(((event_id * 7) % 170) - 85 AS DOUBLE) + 0.25 AS latitude_2
      FROM events
    ),
    segs AS (
      SELECT origin,
             -- haversine, rounded to integer meters per row so the
             -- aggregate sums exact BIGINTs on both engines
             CAST(floor(2.0 * 6371000.0 * asin(sqrt(
               pow(sin(radians(latitude_2 - latitude_1) / 2), 2)
               + cos(radians(latitude_1)) * cos(radians(latitude_2))
                 * pow(sin(radians(longitude_2 - longitude_1) / 2), 2)
             )) + 0.5) AS BIGINT) AS dist_m
      FROM opensky
    )"""

  private val bothEngines: Map[String, String] = Map(

    // brown_p2 CPUNetworkUtilization: COALESCE'd metric min/max/avg per
    // machine over an IN machine-list + time cut
    "rd_brown_cpu_net" -> s"""$LOGS
      SELECT machine_name,
             MIN(cpu) AS cpu_min, MAX(cpu) AS cpu_max,
             CAST(SUM(cpu) AS DOUBLE) / COUNT(*) AS cpu_avg,
             MIN(net_in) AS net_in_min, MAX(net_in) AS net_in_max,
             CAST(SUM(net_in) AS DOUBLE) / COUNT(*) AS net_in_avg,
             MIN(net_out) AS net_out_min, MAX(net_out) AS net_out_max,
             CAST(SUM(net_out) AS DOUBLE) / COUNT(*) AS net_out_avg
      FROM (
        SELECT machine_name,
               COALESCE(cpu_user, 0) AS cpu,
               COALESCE(bytes_in, 0) AS net_in,
               COALESCE(bytes_out, 0) AS net_out
        FROM logs
        WHERE machine_name IN ('mach-3', 'mach-7', 'mach-11')
          AND log_time >= TIMESTAMP '2024-01-02 00:00:00'
      ) r
      GROUP BY machine_name ORDER BY machine_name""",

    // brown_p2 temperatureVariation: nested two-level aggregation
    // (hourly avg -> daily spread), HAVING on the spread, seasonal
    // UNION-distinct of the qualifying devices
    "rd_brown_temp_variation" -> s"""$LOGS,
      temperature AS (
        SELECT dt, device_name, device_type, device_floor
        FROM (
          SELECT dt, hr, device_name, device_type, device_floor,
                 CAST(SUM(metric) AS DOUBLE) / COUNT(*) AS temperature_hourly_avg
          FROM logs
          WHERE device_type = 'view'
          GROUP BY dt, hr, device_name, device_type, device_floor
        ) s
        GROUP BY dt, device_name, device_type, device_floor
        HAVING MAX(temperature_hourly_avg) - MIN(temperature_hourly_avg) >= 200.0
      )
      SELECT DISTINCT device_name, device_type, device_floor, 'EARLY' AS season
      FROM temperature
      WHERE dt >= DATE '2024-01-02' AND dt < DATE '2024-01-05'
      UNION
      SELECT DISTINCT device_name, device_type, device_floor, 'LATE' AS season
      FROM temperature
      WHERE dt >= DATE '2024-01-08' AND dt < DATE '2024-01-11'
      ORDER BY device_name, season""",

    // brown_p2 dailyUV: distinct visitors per day
    "rd_brown_daily_uv" -> s"""$LOGS
      SELECT CAST(dt AS STRING) AS dt,
             CAST(COUNT(DISTINCT client_ip) AS BIGINT) AS uv
      FROM logs GROUP BY dt ORDER BY dt""",

    // brown_p2 hourlyNetworkTraffic: per-hour byte totals
    "rd_brown_hourly_traffic" -> s"""$LOGS
      SELECT CAST(dt AS STRING) AS dt, hr,
             CAST(SUM(COALESCE(bytes_in, 0)) AS BIGINT) AS bytes
      FROM logs GROUP BY dt, hr ORDER BY dt, hr""",

    // brown_p2 offlineMachine: NULL-metric detection with LIKE-prefix
    // machine classes and a time cut, fully ordered
    "rd_brown_offline" -> s"""$LOGS
      SELECT machine_name, CAST(log_time AS STRING) AS log_time
      FROM logs
      WHERE (machine_name LIKE 'mach-1%' OR machine_name LIKE 'mach-3%')
        AND cpu_user IS NULL
        AND log_time >= TIMESTAMP '2024-01-10 00:00:00'
      ORDER BY machine_name, log_time""",

    // brown_p2 excessiveRequests: top talkers with a HAVING floor
    "rd_brown_excessive" -> s"""$LOGS
      SELECT client_ip, CAST(COUNT(*) AS BIGINT) AS requests
      FROM logs GROUP BY client_ip HAVING COUNT(*) > 150
      ORDER BY requests DESC, client_ip LIMIT 20""",

    // github_events affinityByIssuesAndPRs1: repos sharing PR authors
    // with a seed repo set (correlated IN over the same fact), NOT LIKE
    // exclusion, multi-key ordering incl. length()
    "rd_gh_affinity" -> s"""$GH
      SELECT repo_name, CAST(COUNT(*) AS BIGINT) AS prs,
             CAST(COUNT(DISTINCT actor_login) AS BIGINT) AS authors
      FROM gh
      WHERE event_type = 'view'
        AND actor_login IN (
          SELECT actor_login FROM gh
          WHERE event_type = 'view'
            AND repo_name IN ('org-1/repo-1', 'org-1/repo-8'))
        AND lower(repo_name) NOT LIKE '%repo-1'
      GROUP BY repo_name
      ORDER BY authors DESC, prs DESC, length(repo_name) DESC, repo_name
      LIMIT 20""",

    // github_events howHasTheListOfTopRepositoriesChangedOverTheYears:
    // per-period top-5 repos by stars (rank window over the aggregate)
    "rd_gh_top_repos" -> s"""$GH
      SELECT d, repo_name, stars FROM (
        SELECT CAST(CAST(created_at AS DATE) AS STRING) AS d, repo_name,
               CAST(COUNT(*) AS BIGINT) AS stars,
               row_number() OVER (PARTITION BY CAST(created_at AS DATE)
                                  ORDER BY COUNT(*) DESC, repo_name) AS rn
        FROM gh WHERE event_type = 'click'
        GROUP BY CAST(created_at AS DATE), repo_name
      ) t WHERE rn <= 5
      ORDER BY d, stars DESC, repo_name""",

    // github_events howHasTheTotalNumberOfStarsChangedOverTime
    // (day-granular: the fixture spans one month)
    "rd_gh_stars_over_time" -> s"""$GH
      SELECT CAST(CAST(created_at AS DATE) AS STRING) AS d,
             CAST(COUNT(*) AS BIGINT) AS stars
      FROM gh WHERE event_type = 'click'
      GROUP BY CAST(created_at AS DATE) ORDER BY d""",

    // github_events proportionsBetweenStarsAndForks1: CASE pre-pivot +
    // ratio (integer-scaled so both engines emit identical values)
    "rd_gh_proportions" -> s"""$GH
      SELECT repo_name, CAST(SUM(fork) AS BIGINT) AS forks,
             CAST(SUM(star) AS BIGINT) AS stars,
             CAST(floor(CAST(SUM(star) AS DOUBLE) * 1000 / SUM(fork) + 0.5) AS BIGINT) AS ratio_milli
      FROM (
        SELECT repo_name,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS fork,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS star
        FROM gh WHERE event_type IN ('purchase', 'click')
      ) t
      GROUP BY repo_name HAVING SUM(fork) > 0
      ORDER BY forks DESC, repo_name LIMIT 20""",

    // github_events issuesWithTheMostComments1: two-key count ranking
    "rd_gh_most_comments" -> s"""$GH
      SELECT repo_name, issue_number, CAST(COUNT(*) AS BIGINT) AS comments
      FROM gh WHERE event_type = 'error'
      GROUP BY repo_name, issue_number
      ORDER BY comments DESC, repo_name, issue_number LIMIT 20""",

    // github_events organizationsByTheNumberOfStars: split_part org key
    "rd_gh_orgs_by_stars" -> s"""$GH
      SELECT split_part(repo_name, '/', 1) AS org, CAST(COUNT(*) AS BIGINT) AS stars
      FROM gh WHERE event_type = 'click'
      GROUP BY split_part(repo_name, '/', 1) ORDER BY stars DESC, org""",

    // opensky avgDistance: round(avg(st_distance_sphere(...)))
    "rd_sky_avg_distance" -> s"""$SKY
      SELECT CAST(floor(CAST(SUM(dist_m) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS avg_dist_m
      FROM segs""",

    // opensky totalDistance
    "rd_sky_total_distance" -> s"""$SKY
      SELECT CAST(SUM(dist_m) AS BIGINT) AS total_m FROM segs""",

    // opensky mostBusyOrigin
    "rd_sky_busy_origin" -> s"""$SKY
      SELECT origin, CAST(COUNT(*) AS BIGINT) AS flights
      FROM segs GROUP BY origin ORDER BY flights DESC, origin LIMIT 10"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  val oracle: Map[String, String] = bothEngines
}
