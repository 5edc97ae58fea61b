package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FakeIO, GraftIO, SparkIO}

/** API-contract parity between the real and fake IO adapters, checked by
  * reflection — the compiler only binds both to [[GraftIO]]; a public method
  * added to SparkIO alone (not on the trait, not on FakeIO) would silently
  * drift the fake and quietly weaken every hermetic E2E test that swaps it
  * in. Mirrors reference: tests/adapters/test_wrapper_apis.py:79-100 (real's
  * public surface must be a subset of the fake's, signatures identical; the
  * fake MAY add test helpers). */
class IOContractSpec extends AnyFunSuite {

  /** name -> set of (paramTypes, returnType) signatures, public methods
    * only, compiler-generated ($-named: default-arg suppliers, bridges) and
    * Object's methods excluded. */
  private def publicMethods(c: Class[_]): Map[String, Set[(Seq[String], String)]] =
    c.getMethods.toSeq
      .filterNot(_.getDeclaringClass == classOf[Object])
      .filterNot(_.getName.contains("$"))
      .filterNot(_.isSynthetic)
      .groupBy(_.getName)
      .map { case (n, ms) =>
        n -> ms.map(m =>
          (m.getParameterTypes.map(_.getName).toSeq, m.getReturnType.getName)).toSet
      }

  /** The reference's assertion pair: real ⊆ fake, signatures equal. */
  private def assertParity(real: Class[_], fake: Class[_]): Unit = {
    val (rm, fm) = (publicMethods(real), publicMethods(fake))
    val missing = rm.keySet -- fm.keySet
    assert(missing.isEmpty, s"fake ${fake.getSimpleName} missing public methods: $missing")
    val mismatched = rm.collect {
      case (name, sigs) if fm(name) != sigs => (name, sigs, fm(name))
    }
    assert(mismatched.isEmpty, s"signature drift: $mismatched")
  }

  test("both adapters satisfy the GraftIO protocol") {
    assert(classOf[GraftIO].isInstance(new SparkIO))
    assert(classOf[GraftIO].isInstance(new FakeIO()))
  }

  test("SparkIO's public API is a subset of FakeIO's, signatures identical") {
    assertParity(classOf[SparkIO], classOf[FakeIO])
  }

  test("both adapters implement exactly the trait's abstract surface") {
    val traitMethods = publicMethods(classOf[GraftIO]).keySet
    assert(publicMethods(classOf[SparkIO]).keySet == traitMethods,
      "SparkIO must add nothing beyond GraftIO — new capability goes on the trait")
    assert(traitMethods.subsetOf(publicMethods(classOf[FakeIO]).keySet))
  }

  // ---- sanity: the checker itself must catch drift (reference's xfail
  // cases, lines 32-66) ----
  class Real { def methodA(a: Int, b: Double): Double = a * b }
  class FakeOk {
    def methodA(a: Int, b: Double): Double = a * b
    def someTestHelperMethod(c: Boolean): Boolean = c
  }
  class FakeMissing
  class FakeWrongSig { def methodA(a: Int): Int = a }

  test("checker passes a matching fake with extra helpers") {
    assertParity(classOf[Real], classOf[FakeOk])
  }
  test("checker fails a fake with a missing method") {
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertParity(classOf[Real], classOf[FakeMissing])
    }
  }
  test("checker fails a fake with a mismatching signature") {
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertParity(classOf[Real], classOf[FakeWrongSig])
    }
  }
}
