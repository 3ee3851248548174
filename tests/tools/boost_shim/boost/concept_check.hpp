// Test-only shim: concept checks are compile-time assertions with no
// runtime behavior; the reference includes this header but the compiled
// subset never instantiates a concept check.
#ifndef TAXTK_SHIM_BOOST_CONCEPT_CHECK_HPP
#define TAXTK_SHIM_BOOST_CONCEPT_CHECK_HPP
namespace boost {
template <class T>
inline void ignore_unused_variable_warning(const T&) {}
}  // namespace boost
#endif
