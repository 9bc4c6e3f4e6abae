package graft.app

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

import graft.GraftSession
import graft.model.ConfigLoader
import graft.sink.UpsertSink
import graft.sources.Transport
import graft.sync.Syncer

/** Production HTTP transport for the subgraph connector (the reference's
  * global fetch — subgraphProvider.ts:168-176). One shared client; POSTs
  * a GraphQL JSON body.
  */
final class HttpTransport(timeout: Duration = Duration.ofSeconds(30))
    extends Transport {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(timeout).build()

  def post(endpoint: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() != 200)
      throw new RuntimeException(s"HTTP ${res.statusCode()} from $endpoint")
    res.body()
  }
}

/** Application entry — the reference's main() lifecycle (main.ts:9-34):
  * load YAML config (node-config layering: an optional environment
  * overlay named by `GRAFT_ENV` deep-merges over the default, and an
  * optional `custom-environment-variables.yml` next to the config maps
  * env vars onto config paths), create missing tables, run the initial
  * sync, print per-entity counts. The streaming watcher (production
  * mode) attaches a chain-backed [[graft.streaming.BlockSource]] on
  * top — not started here because this environment has no chain
  * endpoint.
  *
  * Usage: Main <config.yml> <warehouseDir>   (GRAFT_ENV=mainnet picks
  * `mainnet.yml` from the config's directory, like NODE_ENV)
  */
object Main {
  def main(args: Array[String]): Unit = {
    val Array(configPath, warehouse) = args.take(2)
    val configDir = Paths.get(configPath).toAbsolutePath.getParent
    def sibling(name: String): Option[String] = {
      val p = configDir.resolve(name)
      if (Files.exists(p)) Some(Files.readString(p)) else None
    }
    val config = ConfigLoader.loadLayered(
      Files.readString(Paths.get(configPath)),
      overlayYaml = sys.env.get("GRAFT_ENV").flatMap(e => sibling(s"$e.yml")),
      envMappingYaml = sibling("custom-environment-variables.yml"))
    val spark = GraftSession.create()
    val sink = new UpsertSink(spark, warehouse)
    val syncer = new Syncer(spark, config, new HttpTransport(), sink)
    val counts = syncer.syncAll()
    counts.toSeq.sortBy(_._1).foreach { case (entity, n) =>
      println(s"$entity: $n rows")
    }
    spark.stop()
  }
}
