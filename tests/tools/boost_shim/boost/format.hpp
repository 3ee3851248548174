// Minimal boost::format stand-in for the directives the reference
// sources actually use ("%d:%d@%s" in taxonpredictionmodelsequence.hh:344
// and simple %d/%i/%s/%f/%e/%g/%x/%o/%% elsewhere).  Supports feeding
// arguments with operator%, str()/boost::str(), ostream output, and
// boost::format's reuse semantics (feeding an argument into a fully-fed
// format starts a new cycle).  Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_FORMAT_HPP
#define TAXTK_SHIM_BOOST_FORMAT_HPP

#include <cctype>
#include <iomanip>
#include <ostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {

class format {
public:
    explicit format(const std::string& fmt) { parse_(fmt); }

    template <class T>
    format& operator%(const T& value) {
        if (next_ >= specs_.size()) reset_();  // boost reuse semantics
        if (next_ >= specs_.size())
            throw std::logic_error("format: too many arguments: " + fmt_);
        values_[next_] = render_(specs_[next_], value);
        ++next_;
        return *this;
    }

    std::string str() const {
        if (next_ != specs_.size())
            throw std::logic_error("format: not enough arguments: " + fmt_);
        std::string out;
        for (size_t i = 0; i < literals_.size(); ++i) {
            out += literals_[i];
            if (i < values_.size()) out += values_[i];
        }
        return out;
    }

private:
    struct Spec {
        char conv = 's';
        int width = -1;
        int precision = -1;
        bool zero_pad = false;
        bool left = false;
    };

    void parse_(const std::string& fmt) {
        fmt_ = fmt;
        std::string lit;
        size_t i = 0;
        while (i < fmt.size()) {
            char c = fmt[i];
            if (c != '%') {
                lit += c;
                ++i;
                continue;
            }
            ++i;  // past '%'
            if (i < fmt.size() && fmt[i] == '%') {
                lit += '%';
                ++i;
                continue;
            }
            Spec s;
            while (i < fmt.size() &&
                   (fmt[i] == '-' || fmt[i] == '+' || fmt[i] == '0' ||
                    fmt[i] == ' ' || fmt[i] == '#')) {
                if (fmt[i] == '0') s.zero_pad = true;
                if (fmt[i] == '-') s.left = true;
                ++i;
            }
            int w = -1;
            while (i < fmt.size() && std::isdigit((unsigned char)fmt[i])) {
                w = (w < 0 ? 0 : w) * 10 + (fmt[i] - '0');
                ++i;
            }
            s.width = w;
            if (i < fmt.size() && fmt[i] == '.') {
                ++i;
                int p = 0;
                while (i < fmt.size() && std::isdigit((unsigned char)fmt[i])) {
                    p = p * 10 + (fmt[i] - '0');
                    ++i;
                }
                s.precision = p;
            }
            // skip length modifiers (l, ll, h, ...)
            while (i < fmt.size() && (fmt[i] == 'l' || fmt[i] == 'h' ||
                                      fmt[i] == 'L' || fmt[i] == 'z'))
                ++i;
            if (i >= fmt.size())
                throw std::logic_error("format: truncated directive: " + fmt);
            s.conv = fmt[i];
            ++i;
            specs_.push_back(s);
            literals_.push_back(lit);
            lit.clear();
        }
        literals_.push_back(lit);
        values_.assign(specs_.size(), std::string());
    }

    void reset_() {
        values_.assign(specs_.size(), std::string());
        next_ = 0;
    }

    template <class T>
    static std::string render_(const Spec& s, const T& value) {
        std::ostringstream ss;
        switch (s.conv) {
            case 'x':
                ss << std::hex;
                break;
            case 'X':
                ss << std::hex << std::uppercase;
                break;
            case 'o':
                ss << std::oct;
                break;
            case 'f':
            case 'F':
                ss << std::fixed;
                if (s.precision >= 0) ss << std::setprecision(s.precision);
                break;
            case 'e':
            case 'E':
                ss << std::scientific;
                if (s.precision >= 0) ss << std::setprecision(s.precision);
                break;
            case 'g':
            case 'G':
                if (s.precision >= 0) ss << std::setprecision(s.precision);
                break;
            default:
                break;  // d/i/u/s/c: plain streaming
        }
        if (s.width >= 0) {
            ss << std::setw(s.width);
            if (s.zero_pad && !s.left) ss << std::setfill('0');
            if (s.left) ss << std::left;
        }
        ss << value;
        return ss.str();
    }

    std::string fmt_;
    std::vector<Spec> specs_;
    std::vector<std::string> literals_;  // specs_.size() + 1 entries
    std::vector<std::string> values_;
    size_t next_ = 0;
};

inline std::string str(const format& f) { return f.str(); }

inline std::ostream& operator<<(std::ostream& os, const format& f) {
    return os << f.str();
}

}  // namespace boost

#endif
