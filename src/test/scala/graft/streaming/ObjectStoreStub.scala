package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.io.File
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** In-process object-store protocol stub: conditional PUT semantics over
  * HTTP (the S3/GCS/Azure shape [[ObjectStoreCommitStore]] speaks),
  * BACKED BY the real local filesystem at the key's path — so the Spark
  * readers in the protocol specs see exactly what the store holds, while
  * the commit paths are forced through object-store semantics and
  * failure modes.
  *
  * Protocol, applied under one global lock:
  *  - `PUT` with `If-None-Match: *`: 412 if the key exists, else create →
  *    201. The create goes through [[LocalFsCommitStore.putIfAbsent]] so
  *    concurrent direct-FS readers never observe a torn object.
  *  - plain `PUT`: last-writer-wins replace → 200 (via
  *    [[LocalFsCommitStore.atomicSwap]] for the same reason).
  *  - `GET`: 200 + bytes, or 404.
  *
  * Failure injection (the modes a real store produces):
  *  - [[failNextPutsBeforeApply]]: the next n PUTs return 500 WITHOUT
  *    applying — a clean server failure.
  *  - [[failNextPutsAfterApply]]: the next n PUTs APPLY their effect and
  *    then return 500 — the ambiguous "your write landed but you'll
  *    never know" response that forces the client's retry discipline.
  */
final class ObjectStoreStub {

  private val lock = new Object
  val failNextPutsBeforeApply = new AtomicInteger(0)
  val failNextPutsAfterApply = new AtomicInteger(0)
  val putCount = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    def handle(ex: HttpExchange): Unit = {
      try handleInner(ex)
      finally ex.close()
    }
  })
  server.start()

  val baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte] = Array.emptyByteArray): Unit = {
    if (body.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, body.length.toLong)
      ex.getResponseBody.write(body)
    }
  }

  private def handleInner(ex: HttpExchange): Unit = {
    val target = new File(ex.getRequestURI.getPath)
    ex.getRequestMethod match {
      case "PUT" =>
        putCount.incrementAndGet()
        val body = ex.getRequestBody.readAllBytes()
        val conditional =
          Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
        lock.synchronized {
          if (failNextPutsBeforeApply.get() > 0) {
            failNextPutsBeforeApply.decrementAndGet()
            respond(ex, 500)
          } else if (conditional) {
            val created = LocalFsCommitStore.putIfAbsent(target, body)
            if (!created) respond(ex, 412)
            else if (failNextPutsAfterApply.get() > 0) {
              failNextPutsAfterApply.decrementAndGet()
              respond(ex, 500) // the write LANDED; the response lies
            } else respond(ex, 201)
          } else {
            LocalFsCommitStore.atomicSwap(target, body)
            if (failNextPutsAfterApply.get() > 0) {
              failNextPutsAfterApply.decrementAndGet()
              respond(ex, 500)
            } else respond(ex, 200)
          }
        }
      case "GET" if ex.getRequestURI.getQuery == "list" =>
        // prefix LIST (ObjectStoreCommitStore.listKeys): bare names of
        // the objects directly under the prefix, one per line
        val names = lock.synchronized {
          Option(target.listFiles()).toSeq.flatten
            .filter(_.isFile).map(_.getName).sorted
        }
        if (names.isEmpty) respond(ex, 404)
        else respond(ex, 200, names.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case "GET" =>
        val bytes = lock.synchronized {
          if (target.isFile) Some(java.nio.file.Files.readAllBytes(target.toPath))
          else None
        }
        bytes match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404)
        }
      case _ => respond(ex, 405)
    }
  }
}
