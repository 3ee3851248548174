// Minimal boost::exception stand-in: error_info tags attach their value
// to a diagnostic string on the exception (the reference only ever
// attaches, never reads back typed infos — grep: no get_error_info in
// core/src), BOOST_THROW_EXCEPTION throws, diagnostic_information
// returns the accumulated text.  Test-only shim; NOT part of the
// framework.
#ifndef TAXTK_SHIM_BOOST_EXCEPTION_ALL_HPP
#define TAXTK_SHIM_BOOST_EXCEPTION_ALL_HPP

#include <sstream>
#include <string>
#include <type_traits>

namespace boost {

template <class Tag, class T>
class error_info {
public:
    explicit error_info(const T& v) : value_(v) {}
    const T& value() const { return value_; }

private:
    T value_;
};

class exception {
public:
    virtual ~exception() = default;
    mutable std::string shim_diagnostic_;
};

template <class E, class Tag, class T>
typename std::enable_if<std::is_base_of<exception, E>::value,
                        const E&>::type
operator<<(const E& x, const error_info<Tag, T>& info) {
    std::ostringstream ss;
    ss << info.value();
    if (!x.shim_diagnostic_.empty()) x.shim_diagnostic_ += "; ";
    x.shim_diagnostic_ += ss.str();
    return x;
}

inline std::string diagnostic_information(const exception& e) {
    return e.shim_diagnostic_;
}

template <class E>
typename std::enable_if<!std::is_base_of<exception, E>::value,
                        std::string>::type
diagnostic_information(const E&) {
    return "(no boost::exception info)";
}

}  // namespace boost

#ifndef BOOST_THROW_EXCEPTION
#define BOOST_THROW_EXCEPTION(x) throw(x)
#endif

#endif
