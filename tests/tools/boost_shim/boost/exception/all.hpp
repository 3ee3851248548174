// Minimal boost::exception stand-in: error_info tags attach a TYPED
// value (recoverable via boost::get_error_info, used by
// taxonfilter.hh:82) plus a diagnostic string; BOOST_THROW_EXCEPTION
// throws; diagnostic_information returns the accumulated text.
// Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_EXCEPTION_ALL_HPP
#define TAXTK_SHIM_BOOST_EXCEPTION_ALL_HPP

#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <type_traits>
#include <typeindex>

namespace boost {

template <class Tag, class T>
class error_info {
public:
    using value_type = typename std::remove_cv<T>::type;
    explicit error_info(const T& v) : value_(v) {}
    const value_type& value() const { return value_; }

private:
    value_type value_;
};

class exception {
public:
    virtual ~exception() = default;
    mutable std::string shim_diagnostic_;
    mutable std::map<std::type_index, std::shared_ptr<void>> shim_infos_;
};

template <class E, class Tag, class T>
typename std::enable_if<std::is_base_of<exception, E>::value,
                        const E&>::type
operator<<(const E& x, const error_info<Tag, T>& info) {
    std::ostringstream ss;
    ss << info.value();
    if (!x.shim_diagnostic_.empty()) x.shim_diagnostic_ += "; ";
    x.shim_diagnostic_ += ss.str();
    using V = typename error_info<Tag, T>::value_type;
    x.shim_infos_[std::type_index(typeid(error_info<Tag, T>))] =
        std::make_shared<V>(info.value());
    return x;
}

// boost::get_error_info<taxid_info>(e) -> const TaxonID* or nullptr
template <class ErrorInfo, class E>
const typename ErrorInfo::value_type* get_error_info(const E& e) {
    const exception* be = dynamic_cast<const exception*>(&e);
    if (!be) return nullptr;
    auto it = be->shim_infos_.find(std::type_index(typeid(ErrorInfo)));
    if (it == be->shim_infos_.end()) return nullptr;
    return static_cast<const typename ErrorInfo::value_type*>(
        it->second.get());
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
