package graft.tools

import graft.Pipeline
import graft.groups.GroupRegistry

/**
 * Registry maintenance CLI — the non-interactive counterpart of the
 * reference's in-TUI group actions (phdupes.rs Q-key ignore, IgnoredEntry
 * db.rs:236-244; suppression flow db.rs:1277-1336):
 *
 *   runMain graft.tools.RegistryCli list <registryPath>
 *   runMain graft.tools.RegistryCli ignored <registryPath>
 *   runMain graft.tools.RegistryCli ignore <registryPath> <uuid> [uuid...]
 *   runMain graft.tools.RegistryCli unignore <registryPath> <uuid> [uuid...]
 *   runMain graft.tools.RegistryCli compact <registryPath>
 *
 * `list` prints hash→uuid counts per uuid; `ignore`/`unignore` append a
 * latest-wins mark (next Pipeline/Incremental run suppresses or
 * re-surfaces the group); `compact` folds registry segments.
 */
object RegistryCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RegistryCli list|ignored|ignore|unignore|compact <registryPath> [uuid...]")
    val cmd = args(0)
    val path = args(1)
    val uuids = args.drop(2).toSeq
    val spark = Pipeline.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    cmd match {
      case "list" =>
        // display is driver-bounded (first 1000 by uuid); totals aggregate
        // distributed — a 10⁸-group registry never collects to the driver
        val reg = GroupRegistry.read(spark, path)
          .groupBy("group_uuid").agg(count(lit(1)).as("hashes"))
        val ignoredDf = GroupRegistry.ignoredUuids(spark, path)
        val ignored = ignoredDf.limit(100000).collect().map(_.getString(0)).toSet
        val total = reg.count()
        val rows = reg.orderBy("group_uuid").limit(1000).collect()
        rows.foreach { r =>
          val u = r.getString(0)
          val mark = if (ignored(u)) " [ignored]" else ""
          println(f"${r.getLong(1)}%6d hashes  $u$mark")
        }
        if (total > rows.length) println(s"... ${total - rows.length} more")
        println(s"== $total registered groups, ${ignored.size} ignored ==")
      case "ignored" =>
        val rows = GroupRegistry.ignoredUuids(spark, path).collect()
        rows.foreach(r => println(r.getString(0)))
        println(s"== ${rows.length} ignored groups ==")
      case "ignore" | "unignore" =>
        require(uuids.nonEmpty, s"$cmd needs at least one uuid")
        GroupRegistry.setIgnored(spark, path, uuids, ignored = cmd == "ignore")
        println(s"== ${uuids.length} groups ${cmd}d (takes effect on the next run) ==")
      case "compact" =>
        GroupRegistry.compact(spark, path)
        println("== registry compacted ==")
      case other => sys.error(s"unknown command '$other'")
    }
    spark.stop()
  }
}
