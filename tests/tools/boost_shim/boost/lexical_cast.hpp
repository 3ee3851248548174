// Minimal boost::lexical_cast stand-in (string<->arithmetic, full-
// consumption check, bad_lexical_cast on failure; identity fast path for
// string targets so values with no whitespace splitting surprises).
// Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_LEXICAL_CAST_HPP
#define TAXTK_SHIM_BOOST_LEXICAL_CAST_HPP

#include <sstream>
#include <string>
#include <typeinfo>

namespace boost {

class bad_lexical_cast : public std::bad_cast {
public:
    const char* what() const noexcept override { return "bad lexical cast"; }
};

namespace shim_detail {

template <class Target>
struct caster {
    template <class Source>
    static Target cast(const Source& s) {
        std::stringstream ss;
        ss << s;
        Target t;
        ss >> t;
        if (ss.fail() || !ss.eof()) throw bad_lexical_cast();
        return t;
    }
};

template <>
struct caster<std::string> {
    template <class Source>
    static std::string cast(const Source& s) {
        std::ostringstream ss;
        ss << s;
        return ss.str();
    }
    static std::string cast(const std::string& s) { return s; }
};

}  // namespace shim_detail

template <class Target, class Source>
Target lexical_cast(const Source& s) {
    return shim_detail::caster<Target>::cast(s);
}

}  // namespace boost

#endif
