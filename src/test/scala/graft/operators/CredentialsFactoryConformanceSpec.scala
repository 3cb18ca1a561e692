package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterEach

/** The reference suite's 21 factory-matching cases replayed verbatim
  * (tests/unit/util/test_credentials.py
  * `test_getter_credentials_returns_expected_credential_object`,
  * :700-965): YAML/JSON content → expected credentials class, None, or
  * an invalid-configuration error.
  */
class CredentialsFactoryConformanceSpec extends AnyFunSuite with Matchers
    with BeforeAndAfterEach {

  override def afterEach(): Unit = {
    sys.props.remove("graft.credentials.file")
    Credentials.clearCache()
  }

  private def resolve(content: String): Option[Credentials.Creds] = {
    val f = java.io.File.createTempFile("creds", ".yml")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    sys.props("graft.credentials.file") = f.getAbsolutePath
    Credentials.clearCache()
    Credentials.fromTarget("https://some.url/target")
  }

  // (testcase, file content, expected) — expected: Some(classOf), None,
  // or "error"
  private sealed trait Want
  private case class Is(cls: Class[_]) extends Want
  private case object NoneWant extends Want
  private case object ErrorWant extends Want

  private val cases: Seq[(String, String, Want)] = Seq(
    ("BasicAuthCredentials",
      """getter:
        |  "https://some.url":
        |    username: test
        |    password: test
        |""".stripMargin, Is(classOf[Credentials.BasicAuth])),
    ("OAuth2PasswordFlowCredentials",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    username: test
        |    password: test
        |""".stripMargin, Is(classOf[Credentials.OAuth2PasswordFlow])),
    ("OAuth2ClientFlowCredentials",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    client_id: test
        |    client_secret: test
        |""".stripMargin, Is(classOf[Credentials.OAuth2ClientFlow])),
    ("OAuth2TokenCredentials",
      """getter:
        |  "https://some.url":
        |    token: "jsoskdmoiewjdoeijkxsmoiqw8jdiowd0"
        |""".stripMargin, Is(classOf[Credentials.StaticToken])),
    ("None if credentials are missing",
      """getter:
        |  "https://some.url":
        |""".stripMargin, NoneWant),
    ("None if wrong URL is given",
      """getter:
        |  "https://some.other.url":
        |    token: "jsoskdmoiewjdoeijkxsmoiqw8jdiowd0"
        |""".stripMargin, NoneWant),
    ("invalid yml raises",
      """getter:
        |  "https://some.url":
        |    password no colon here
        |    username: test
        |    endpoint: https://endpoint.end
        |""".stripMargin, ErrorWant),
    ("valid json -> OAuth2ClientFlowCredentials",
      """{
        |"getter": {
        |  "https://some.url": {
        |    "endpoint": "https://endpoint.end",
        |    "client_id": "test",
        |    "client_secret": "test"
        |    }
        |  }
        |}
        |""".stripMargin, Is(classOf[Credentials.OAuth2ClientFlow])),
    ("invalid json raises",
      """{
        |"getter": {
        |  "https://some.url":
        |    "endpoint": "https://endpoint.end",
        |    "client_id": "test",
        |""".stripMargin, ErrorWant),
    ("PasswordFlow with extra client_id",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    client_id: test
        |    username: test
        |    password: test
        |""".stripMargin, Is(classOf[Credentials.OAuth2PasswordFlow])),
    ("Token wins when other params are given",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    client_id: test
        |    username: test
        |    client_secret: test
        |    password: test
        |    token: "73475289038didjhwxnwnxwoiencn"
        |""".stripMargin, Is(classOf[Credentials.StaticToken])),
    ("wrong type (int username) raises",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    username: 123
        |    password: test
        |    client_secret: 456
        |""".stripMargin, ErrorWant),
    ("confidential password flow when all five present",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    client_id: test
        |    username: test
        |    password: test
        |    client_secret: test
        |""".stripMargin, Is(classOf[Credentials.OAuth2PasswordFlow])),
    ("None if no matching class",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    username: test
        |    client_secret: test
        |""".stripMargin, NoneWant),
    ("null password raises",
      """getter:
        |  "https://some.url":
        |    endpoint: https://endpoint.end
        |    username: test
        |    password:
        |""".stripMargin, ErrorWant),
    ("MTLS with cert and key",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |    cert: "path/to/cert"
        |""".stripMargin, Is(classOf[Credentials.MTls])),
    ("MTLS with ca cert beats oauth params",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |    cert: "path/to/cert"
        |    ca_cert: "path/to/ca/cert"
        |    endpoint: https://endpoint.end
        |    client_id: test
        |    username: test
        |    password: test
        |    client_secret: test
        |""".stripMargin, Is(classOf[Credentials.MTls])),
    ("MTLS with ca cert and extra params",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |    cert: "path/to/cert"
        |    ca_cert: "path/to/ca/cert"
        |""".stripMargin, Is(classOf[Credentials.MTls])),
    ("MTLS with extra parameters",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |    cert: "path/to/cert"
        |    endpoint: https://endpoint.end
        |    username: test
        |""".stripMargin, Is(classOf[Credentials.MTls])),
    ("None if certificate is missing",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |""".stripMargin, NoneWant),
    ("empty cert value raises",
      """getter:
        |  "https://some.url":
        |    client_key: "path/to/client/key"
        |    cert:
        |""".stripMargin, ErrorWant)
  )

  cases.foreach { case (name, content, want) =>
    test(s"reference factory case: $name") {
      want match {
        case Is(cls) =>
          val got = resolve(content)
          got should not be None
          got.get.getClass shouldBe cls
        case NoneWant => resolve(content) shouldBe None
        case ErrorWant => an[Exception] should be thrownBy resolve(content)
      }
    }
  }
}
